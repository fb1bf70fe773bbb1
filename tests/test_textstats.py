import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from node_shovel_ray.functions.textstats import (
    LangId,
    QualityScore,
    fingerprint,
    token_count,
)


def test_token_count_vs_python():
    texts = ["a b  c", "", "   ", "one", "x y z w v"]
    out = token_count(pa.table({"text": pa.array(texts)}))
    assert out["n_tokens"].to_pylist() == [len(t.split()) for t in texts]


def test_token_count_matches_documents_table():
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = ds.map_batches(token_count, batch_format="pyarrow").to_pandas()
    assert (out["n_tokens"] == out["text"].str.split().str.len()).all()


def test_quality_score_ranges():
    df = pd.DataFrame({"text": [
        "the cat sat on the mat and it is a fine day for all of us",
        "!!! ??? ### $$$ %%%",
        "",
    ]})
    out = QualityScore()(df)
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    assert out.loc[0, "quality"] > out.loc[1, "quality"]  # prose beats noise


def test_langid_heuristic():
    df = pd.DataFrame({"text": [
        "the quick fox and the dog in a field of dreams",
        "der Hund und die Katze sind nicht zu Hause mit der Maus",
        "le chat est dans la maison et il ne veut pas sortir pour le moment",
        "12345",
    ]})
    out = LangId()(df)
    assert out["lang_pred"].tolist()[:3] == ["en", "de", "fr"]
    assert out["lang_pred"].tolist()[3] == "unknown"


def test_quality_punct_matches_duckdb_on_non_ascii():
    """ADVICE r2: Python-unicode \\w vs RE2-ASCII \\w diverged on non-ASCII
    text. Both sides now use the explicit class [^A-Za-z0-9_\\s]; pin the
    agreement on the exact strings that used to drift."""
    import duckdb

    from node_shovel_ray.functions.textstats import quality_score

    texts = ["café ok", "é中文!", "plain ascii, punct!", ""]
    t = quality_score(pa.table({"text": pa.array(texts)}))
    got = dict(zip(texts, (np.asarray(t["n_chars_q"]) * np.asarray(t["punct_ratio"])).round().astype(int)))
    con = duckdb.connect()
    for s in texts:
        (n_punct,) = con.execute(
            r"SELECT length(?) - length(regexp_replace(?, '[^A-Za-z0-9_\s]', '', 'g'))",
            [s, s],
        ).fetchone()
        assert got[s] == n_punct, (s, got[s], n_punct)


def test_vectorized_matches_class_wrappers():
    """quality_score/lang_id (Arrow task fns) == QualityScore/LangId
    (pandas wrappers) on mixed content incl. empty + null rows."""
    df = pd.DataFrame({"text": ["the cat is on the mat", "", None, "123 !!", "der Hund und die Katze"]})
    q = QualityScore()(df.copy())
    l = LangId()(df.copy())
    assert list(q.columns[-6:]) == ["n_chars_q", "n_words", "punct_ratio", "stop_ratio", "mean_word_len", "quality"]
    assert l["lang_pred"].tolist() == ["en", "unknown", "unknown", "unknown", "de"]


def test_repetition_stats():
    from node_shovel_ray.functions.textstats import repetition_stats

    t = pa.table({"text": pa.array([
        "a b c a b c a b c",   # "a b c"x3: 7 trigrams, 3 distinct
        "w x y z",             # all distinct
        "q r",                 # < n tokens
        "",
    ])})
    out = repetition_stats(t, n=3)
    assert out["n_ngrams"].to_pylist() == [7, 2, 0, 0]
    assert out["n_distinct_ngrams"].to_pylist() == [3, 2, 0, 0]
    r = out["dup_ngram_ratio"].to_pylist()
    assert r[0] == round(1 - 3 / 7, 4) and r[1] == 0.0 and r[2] == 0.0


def test_ngram_contamination(ray_session):
    import ray.data as rd

    from node_shovel_ray.functions.dedup import ngram_contamination, text_ngrams

    bench = text_ngrams(["the quick brown fox jumps over the lazy dog"], n=5)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "totally unrelated content here about other things entirely now",
            "he said the quick brown fox jumps far today",  # shares a 5-gram
            "short",
        ]),
    }))
    got = sorted(ngram_contamination(docs, bench, n=5).to_pandas()["doc_id"])
    assert got == [2]


def test_pii_stats():
    from node_shovel_ray.functions.textstats import pii_stats

    t = pa.table({"text": pa.array([
        "mail me at a.b@example.com or c@d.org thanks",
        "call +1 (555) 123-4567 now",
        "server at 10.0.0.1 and 192.168.1.254",
        "clean text with no pii at all",
        None,
    ])})
    out = pii_stats(t)
    assert out["n_emails"].to_pylist() == [2, 0, 0, 0, 0]
    assert out["n_phones"].to_pylist() == [0, 1, 0, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 0, 2, 0, 0]


def test_fingerprint_stability():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    t = pa.table({"text": pa.array([base, base, base + " tail-change"])})
    out = fingerprint(t)["fingerprint"].to_pylist()
    assert out[0] == out[1]  # identical text → identical fingerprint
    # small tail edit usually keeps the min-window fingerprint
    assert isinstance(out[2], int)


def test_unigram_logprob_edge_whitespace(tmp_path):
    """ADVICE r3: leading/trailing whitespace emits empty boundary tokens;
    index_in returns null for them (absent from vocab) and a null-bearing
    to_numpy() is float64/NaN — must not crash and must score correctly."""
    import math

    import pyarrow.parquet as pq

    from node_shovel_ray.pipelines.corpus import unigram_logprob_docs

    texts = ["hello world\n", "", "  hello  ", None, "\tworld hello\n\n", "   "]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}),
        tmp_path / "documents.parquet",
    )
    out = (
        unigram_logprob_docs(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")["avg_neg_logprob"]
    )
    # docs 1 ('' ), 3 (null), 5 (spaces only) have zero tokens → omitted
    assert sorted(out.index) == [0, 2, 4]
    # corpus token counts: hello×3, world×2 of 5 total
    lp = {"hello": math.log(3 / 5), "world": math.log(2 / 5)}

    def expect(toks):
        v = -sum(lp[t] for t in toks) / len(toks)
        return math.floor(v * 10_000 + 0.5) / 10_000

    assert out[0] == expect(["hello", "world"])
    assert out[2] == expect(["hello"])
    assert out[4] == expect(["world", "hello"])


def test_tfidf_docs_hand_computed(tmp_path):
    """TF-IDF rarity score: idf = ln(N/df) over distinct-per-doc counts,
    occurrence-weighted mean per doc, zero-token docs omitted."""
    import math

    import pyarrow.parquet as pq

    from node_shovel_ray.pipelines.corpus import tfidf_docs

    texts = ["a a b", "a c", "", None, "  b  "]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}),
        tmp_path / "documents.parquet",
    )
    out = tfidf_docs(str(tmp_path)).to_pandas().set_index("doc_id")["avg_idf"]
    assert sorted(out.index) == [0, 1, 4]
    # N = 5 docs; df: a→2 docs, b→2, c→1
    idf = {"a": math.log(5 / 2), "b": math.log(5 / 2), "c": math.log(5 / 1)}

    def expect(toks):
        v = sum(idf[t] for t in toks) / len(toks)
        return math.floor(v * 10_000 + 0.5) / 10_000

    assert out[0] == expect(["a", "a", "b"])  # occurrence-weighted: a twice
    assert out[1] == expect(["a", "c"])
    assert out[4] == expect(["b"])


def test_line_dedup_docs_removes_boilerplate(tmp_path):
    """Cross-doc line dedup: a line present in >= 2 docs is removed from
    ALL docs (including empty-text and all-lines-removed edge cases);
    unique lines and blank lines survive, order preserved."""
    import pyarrow.parquet as pq

    from node_shovel_ray.pipelines.corpus import line_dedup_docs

    texts = [
        "COOKIE BANNER\nreal content one\nfooter",
        "COOKIE BANNER\nreal content two\n\nfooter",
        "only unique here",
        "",
        None,
        "footer",  # a doc that IS just the boilerplate
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}),
        tmp_path / "documents.parquet",
    )
    out = (
        line_dedup_docs(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out["text_clean"]) == [
        "real content one",
        "real content two\n",  # blank line kept, trailing footer removed
        "only unique here",
        "",
        "",
        "",  # all lines removed -> empty doc, still present
    ]
    assert list(out["n_removed"]) == [2, 2, 0, 0, 0, 1]

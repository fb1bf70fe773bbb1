"""Training-data corpus pipelines over the documents/embeddings tables:
dedup, text analysis, similarity search — queries()-facing wrappers."""

from __future__ import annotations

import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..functions.dedup import dedup_exact_counts, minhash_lsh_pairs, simhash_pairs
from ..functions.similarity import knn_brute_force, knn_ivf
from ..functions.textstats import fingerprint, lang_id, quality_score, token_count
from ..stages.keyed import default_pool


_log = logging.getLogger("node_shovel_ray.corpus")


def _docs(sf_dir: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def dedup_exact_docs(sf_dir: str) -> "rd.Dataset":
    return dedup_exact_counts(
        _docs(sf_dir, ["doc_id", "text"]), key_col="text", id_col="doc_id"
    )


def token_stats_docs(sf_dir: str) -> "rd.Dataset":
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(token_count, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "n_tokens"])
    )


def neardup_dedup_docs(sf_dir: str) -> "rd.Dataset":
    """End-to-end near-dup REMOVAL (pairs → connected components → keep
    min-id representative), fully SQL-oracle-paired since r5: the pair
    list comes from the md5 permutation family
    (functions/dedup.minhash_pairs_md5 — DuckDB-identical), and the
    component/drop logic is reproduced by a recursive-CTE transitive
    closure (sql_oracle.Q_NEARDUP_DEDUP). The 61-bit family + bucket caps
    remain dedup_near's default for the throughput path."""
    from ..functions.dedup import dedup_near, minhash_pairs_md5

    docs = _docs(sf_dir, ["doc_id", "text"])
    return dedup_near(
        docs, threshold=0.5, pairs=minhash_pairs_md5(docs, threshold=0.5)
    )


def vocab_top_tokens(sf_dir: str, k: int = 20) -> "rd.Dataset":
    """Vocabulary head: top-k whitespace tokens by corpus frequency.

    Pre-aggregated per batch (value_counts inside map_batches) before the
    groupby-sum exchange — the exchange carries one row per distinct token
    per block, never the token stream. Deterministic tie-break (n desc,
    token asc)."""
    import pyarrow.compute as pc

    def batch_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(batch_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def local_topk(df):
        # partial top-k per block: the global sort then sees only
        # k × n_blocks rows, not the full distinct-token table
        return df.sort_values(["n", "token"], ascending=[False, True]).head(k)

    pruned = counts.map_batches(local_topk, batch_format="pandas")
    return pruned.sort(["n", "token"], descending=[True, False]).limit(k)


def bpe_token_stats_docs(sf_dir: str) -> "rd.Dataset":
    """BPE-ish token estimate (GPT-2-pretokenizer-style regex count) —
    vectorized RE2 count, SQL-oracle-checked (same RE2 engine in DuckDB)."""
    from ..functions.textstats import bpe_ish_token_count

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(bpe_ish_token_count, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "n_bpe_tokens"])
    )


def quality_docs(sf_dir: str) -> "rd.Dataset":
    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = quality_score(t)
        t = t.select(["doc_id", "n_words", "punct_ratio", "stop_ratio", "quality"])
        for c in ("punct_ratio", "stop_ratio", "quality"):
            t = t.set_column(
                t.schema.get_field_index(c), c,
                pc.round(t[c], 4, round_mode="half_towards_infinity"),
            )
        return t

    # task closure, single fused stage — no actor-pool spin-up
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def langid_docs(sf_dir: str) -> "rd.Dataset":
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(lang_id, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "lang_pred"])
    )


def fingerprint_docs(sf_dir: str) -> "rd.Dataset":
    """Min-hash shingle fingerprint, md5-hashed so DuckDB reproduces it
    exactly (fully oracle-paired since r3 — was `no_oracle`). The
    vectorized rolling-hash :func:`~..functions.textstats.fingerprint`
    remains the fast path where SQL parity is not required."""
    from ..functions.textstats import fingerprint_md5

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(fingerprint_md5, batch_format="pyarrow")
        .select_columns(["doc_id", "fingerprint"])
    )


def normalize_docs(sf_dir: str) -> "rd.Dataset":
    """Canonical text normalization (NFC → lower → collapse ws → trim) —
    the dedup/curation preprocessing stage; pure Arrow kernels with exact
    DuckDB twins (oracle-paired)."""
    from ..functions.textstats import normalize_text

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(normalize_text, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "text_norm"])
    )


def sample_docs_per_lang(sf_dir: str, k: int = 25) -> "rd.Dataset":
    """Deterministic per-language sample (training-data curation: K docs
    per stratum, reproducible across retries/resume). Fully oracle-paired:
    md5 rank is reproduced by SQL row_number() ordering."""
    from ..functions.sampling import sample_per_group

    out = sample_per_group(
        _docs(sf_dir, ["doc_id", "lang"]), group_col="lang", k=k, id_col="doc_id"
    )
    return out.select_columns(["doc_id", "lang"])


def sample_docs_fraction(sf_dir: str, p: float = 0.2) -> "rd.Dataset":
    """Deterministic Bernoulli(p) corpus subset — a pure streaming filter
    (hash(doc_id) < p·2⁶⁴); oracle-paired via the same md5 cutoff."""
    from ..functions.sampling import sample_fraction

    return sample_fraction(_docs(sf_dir, ["doc_id", "lang"]), p=p, id_col="doc_id")


def sample_docs_topn(sf_dir: str, n: int = 200) -> "rd.Dataset":
    """Exact-size deterministic global sample — the n docs with the
    smallest (md5(doc_id) >> 1, doc_id). The "exactly N documents" cut a
    data-mixture spec asks for (Bernoulli only hits N in expectation);
    fully oracle-paired via SQL row_number over the same shifted hash."""
    from ..functions.sampling import sample_topn

    return sample_topn(_docs(sf_dir, ["doc_id", "lang"]), n=n, id_col="doc_id")


def curated_docs(sf_dir: str, min_quality: float = 0.4, k: int = 10) -> "rd.Dataset":
    """The corpus-curation FLAGSHIP: the composed training-data pipeline a
    100 TB run actually executes —

      normalize → quality-score filter → exact dedup on normalized text
      (keep min doc_id) → deterministic per-language sample (k per lang)

    — end-to-end as ONE streaming Ray plan (two keyed exchanges: dedup on
    text_norm, sample on lang; everything else is task-fused map_batches),
    and end-to-end SQL-oracle-paired (every stage has an exact DuckDB
    twin; the filter compares the ROUNDED quality on both sides so float
    tie-break cannot diverge)."""
    import pyarrow.compute as pc

    from ..functions.sampling import sample_per_group
    from ..functions.textstats import normalize_text, quality_score
    from ..stages.keyed import first_per_key_block, keyed_map_blocks

    def prep(t: pa.Table) -> pa.Table:
        t = normalize_text(t)
        t = quality_score(t)
        q = pc.round(t["quality"], 4, round_mode="half_towards_infinity")
        keep = pc.greater_equal(q, min_quality)
        return t.filter(keep).select(["doc_id", "lang", "text_norm"])

    ds = _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    dedup = keyed_map_blocks(
        ds, ["text_norm"], first_per_key_block(["text_norm"], order_col="doc_id")
    ).drop_columns(["text_norm"])
    return sample_per_group(
        dedup, group_col="lang", k=k, id_col="doc_id"
    ).select_columns(["doc_id", "lang"])


def pack_docs_seq(sf_dir: str, budget: int = 512) -> "rd.Dataset":
    """Sequence packing (functions/packing.pack_docs): every doc's global
    token offset in doc_id order and its training-window id — the
    concat-then-chunk LLM data-prep step, built on a distributed ordered
    prefix sum (range buckets + driver-side bucket-total prefix; the
    driver only ever sees n_buckets numbers). Fully oracle-paired: the
    whole operator is one SQL window cumsum."""
    from ..functions.packing import pack_docs

    counts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(token_count, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "n_tokens"])
    )
    return pack_docs(counts, budget=budget)


def decontaminate_docs(sf_dir: str) -> "rd.Dataset":
    """Eval-set decontamination: drop every document whose NORMALIZED text
    exactly matches a benchmark blocklist (here: the deterministic pretend
    eval set doc_id % 97 == 0). The blocklist is a small broadcast set →
    streaming anti-join filter, the corpus never shuffles; matching is on
    normalize_text output so whitespace/case variants are caught."""
    import pyarrow.compute as pc

    from ..functions.textstats import normalize_text

    def norm(t: pa.Table) -> pa.Table:
        return normalize_text(t).select(["doc_id", "text_norm"])

    # benchmark texts: a SEPARATE filtered read — the ~1% bench rows are
    # selected BEFORE normalize, so normalize_text runs over the corpus
    # exactly once (in the anti pass below); deriving the blocklist from
    # the shared lazy `docs` re-ran normalize over the full corpus twice
    def bench_norm(t: pa.Table) -> pa.Table:
        m = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 97), 97))
        return norm(t.filter(pc.equal(m, 0)))

    # small side, collected once and broadcast into the anti filter (null
    # text_norm never blocks — NOT EXISTS semantics, matching the SQL twin)
    bench_tn = {
        r["text_norm"]
        for r in _docs(sf_dir, ["doc_id", "text"])
        .map_batches(bench_norm, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["text_norm"])
        .take_all()
        if r["text_norm"] is not None
    }
    blockset = pa.array(sorted(bench_tn), pa.string())

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    )

    def anti(t: pa.Table) -> pa.Table:
        hit = pc.fill_null(pc.is_in(t["text_norm"], value_set=blockset), False)
        return t.filter(pc.invert(hit)).select(["doc_id"])

    return docs.map_batches(anti, batch_format="pyarrow")


def decontaminate_bloom_docs(sf_dir: str, bits_per_key: int = 12,
                             k: int = 8) -> "rd.Dataset":
    """Same contract as :func:`decontaminate_docs`, scaled for HUGE
    blocklists: instead of broadcasting the raw blocklist strings (GBs at
    a 10M-entry eval set), broadcast a ~12-bits/key Bloom filter
    (functions/bloom.py). The corpus streams through one normalize pass;
    bloom-negatives (the overwhelming majority) are kept immediately,
    and only the bloom-positive sliver (true matches + ~0.3% false
    positives) is checked EXACTLY against the blocklist via a distributed
    anti join — so the result is exact and the plain variant's SQL oracle
    applies unchanged. No O(keys) driver set, no O(keys·strlen)
    broadcast: driver memory is O(filter bits), per-actor state is the
    bitmap fetched once from plasma.
    """
    import pyarrow.compute as pc
    import ray

    from ..functions.bloom import bloom_from_datasets, bloom_query, default_hash64
    from ..functions.textstats import normalize_text
    from ..stages.join import hash_join
    from ..stages.keyed import default_num_blocks, keyed_map_blocks

    _hash = default_hash64

    def norm(t: pa.Table) -> pa.Table:
        return normalize_text(t).select(["doc_id", "text_norm"])

    def bench_norm(t: pa.Table) -> pa.Table:
        m = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 97), 97))
        return norm(t.filter(pc.equal(m, 0)))

    # blocklist side: filtered read (only ~1% of rows normalized), small,
    # reused three times (count, filter build, exact verify) → materialize.
    # Coalesce first: the filter leaves one ~1%-sliver block PER READ TASK
    # (hundreds of tiny blocks at 10M docs), and a sort exchange launches
    # input_blocks × partitions tasks — measured 68 s of pure task overhead
    # on the verify join before coalescing, ~3 s after.
    nb = max(8, default_num_blocks() // 8)
    bench = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(bench_norm, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["text_norm"])
        .repartition(nb)
        .materialize()
    )
    bf = bloom_from_datasets(
        bench, "text_norm", max(bench.count(), 1), _hash,
        bits_per_key=bits_per_key, k=k,
    )
    bf_ref = ray.put(bf)

    # ONE normalize pass over the corpus; the output drops the wide text
    # and keeps text_norm only for bloom-positives, so materializing it
    # (needed to branch without re-running normalize) is cheap
    def probe(t: pa.Table) -> pa.Table:
        f = ray.get(bf_ref)  # zero-copy plasma read, cached per node
        t = norm(t)
        tn = t["text_norm"].to_pandas()
        maybe = np.zeros(len(t), dtype=bool)
        nn = tn.notna().to_numpy()
        if nn.any():  # null text_norm never matches (NOT EXISTS semantics)
            maybe[nn] = bloom_query(f, _hash(tn[nn].to_numpy(dtype=object)))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "maybe": pa.array(maybe),
                "text_norm": pa.array(tn.where(maybe, None), pa.string()),
            }
        )

    reduced = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def negatives(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t["maybe"])).select(["doc_id"])

    def positives(t: pa.Table) -> pa.Table:
        return t.filter(t["maybe"]).select(["doc_id", "text_norm"])

    keep = reduced.map_batches(negatives, batch_format="pyarrow")
    # positives are a sliver of the corpus → same tiny-block coalesce
    pos = reduced.map_batches(positives, batch_format="pyarrow").repartition(nb)

    # exact verify: anti join the sliver against the distinct blocklist
    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("text_norm")

    bench_marked = keyed_map_blocks(
        bench, ["text_norm"], distinct, num_blocks=nb
    ).map_batches(
        lambda t: t.append_column("_bench", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow",
    )
    joined = hash_join(
        pos, bench_marked, left_on="text_norm", how="left", num_blocks=2 * nb
    )
    fps = joined.map_batches(
        lambda t: t.filter(pc.is_null(t["_bench"])).select(["doc_id"]),
        batch_format="pyarrow",
    )
    return keep.union(fps)


def repetition_docs(sf_dir: str, n: int = 3) -> "rd.Dataset":
    """Gopher/C4-style intra-doc repetition signal: duplicate-n-gram ratio
    per document (fully oracle-paired via list_distinct)."""
    from ..functions.textstats import repetition_stats

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            lambda t: repetition_stats(t, n=n),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .select_columns(["doc_id", "n_ngrams", "n_distinct_ngrams", "dup_ngram_ratio"])
    )


def contaminated_docs(sf_dir: str, n: int = 5) -> "rd.Dataset":
    """Benchmark contamination by n-gram overlap: non-benchmark docs
    sharing ≥1 word 5-gram with the pretend eval set (doc_id % 97 == 0).
    Benchmark n-grams broadcast; the corpus streams (never shuffles)."""
    import pyarrow.compute as pc

    from ..functions.dedup import ngram_contamination, text_ngrams

    def is_bench(t: pa.Table) -> pa.Table:
        m = pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 97), 97)
        )
        return t.filter(pc.equal(m, 0))

    def not_bench(t: pa.Table) -> pa.Table:
        m = pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 97), 97)
        )
        return t.filter(pc.not_equal(m, 0))

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench_texts = [
        r["text"] for r in docs.map_batches(is_bench, batch_format="pyarrow").take_all()
    ]
    bench = text_ngrams(bench_texts, n=n)
    probe = docs.map_batches(not_bench, batch_format="pyarrow")
    return ngram_contamination(probe, bench, n=n)


def contaminated_bloom_docs(sf_dir: str, n: int = 5, bits_per_key: int = 12,
                            k: int = 8) -> "rd.Dataset":
    """Same contract (and same SQL oracle) as :func:`contaminated_docs`,
    scaled for HUGE benchmark sets (VERDICT r4 #7): the plain variant's
    ``take_all()`` of bench texts + driver n-gram build is
    eval-set-sized-only. Here the bench n-gram set is built DISTRIBUTED
    (per-block distinct → one gram-keyed exchange; the driver never holds
    texts or grams), broadcast as a ~12-bits/gram Bloom filter
    (functions/bloom.bloom_from_datasets — driver memory O(filter bits)),
    and the corpus streams one probe pass: docs whose grams are all
    bloom-negative drop immediately; the bloom-positive (doc, gram)
    sliver (true hits + ~0.3% false positives) is verified EXACTLY
    against the distinct bench grams via a distributed gram-keyed join —
    result identical to the plain variant by construction."""
    import pyarrow.compute as pc
    import ray

    from ..functions.bloom import bloom_from_datasets, bloom_query, default_hash64
    from ..functions.dedup import _flat_ngrams
    from ..stages.join import hash_join
    from ..stages.keyed import default_num_blocks, keyed_map_blocks

    docs = _docs(sf_dir, ["doc_id", "text"])
    nb = max(8, default_num_blocks() // 8)

    def bench_gram_rows(t: pa.Table) -> pa.Table:
        m = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 97), 97))
        t = t.filter(pc.equal(m, 0))
        grams, _ = _flat_ngrams(t["text"].to_pylist(), n)
        uniq = np.unique(np.asarray(grams, dtype=object)) if len(grams) else []
        return pa.table({"gram": pa.array(uniq, pa.string())})

    # distinct bench grams, distributed; coalesced (filtered slivers →
    # tiny blocks, CLAUDE.md) + materialized (reused: count, bloom build,
    # exact verify)
    bench_grams = keyed_map_blocks(
        docs.map_batches(bench_gram_rows, batch_format="pyarrow"),
        ["gram"],
        lambda df: df.drop_duplicates("gram"),
        num_blocks=nb,
    ).repartition(nb).materialize()

    bf = bloom_from_datasets(
        bench_grams, "gram", max(bench_grams.count(), 1), default_hash64,
        bits_per_key=bits_per_key, k=k,
    )
    bf_ref = ray.put(bf)

    def probe(t: pa.Table) -> pa.Table:
        m = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 97), 97))
        t = t.filter(pc.not_equal(m, 0))
        grams, offs = _flat_ngrams(t["text"].to_pylist(), n)
        if not len(grams):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "gram": pa.array([], pa.string())}
            )
        f = ray.get(bf_ref)  # plasma read, cached per node
        hit = bloom_query(f, default_hash64(np.asarray(grams, dtype=object)))
        ids = np.repeat(t["doc_id"].to_numpy(), np.diff(offs))[hit]
        gs = np.asarray(grams, dtype=object)[hit]
        pairs = pd.DataFrame({"doc_id": ids, "gram": gs}).drop_duplicates()
        return pa.table(
            {"doc_id": pa.array(pairs["doc_id"].to_numpy(np.int64)),
             "gram": pa.array(pairs["gram"].to_numpy(object), pa.string())}
        )

    pos = docs.map_batches(probe, batch_format="pyarrow").repartition(nb)
    bench_marked = bench_grams.map_batches(
        lambda t: t.append_column("_bench", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow",
    )
    joined = hash_join(
        pos, bench_marked, left_on="gram", how="left", num_blocks=2 * nb
    )
    matched = joined.map_batches(
        lambda t: t.filter(pc.is_valid(t["_bench"])).select(["doc_id"]),
        batch_format="pyarrow",
    )
    return keyed_map_blocks(
        matched, ["doc_id"], lambda df: df.drop_duplicates("doc_id"),
        num_blocks=nb,
    )


def crossdoc_gram_docs(sf_dir: str, n: int = 3, min_df: int = 2,
                       hashed: bool = False) -> "rd.Dataset":
    """Cross-document n-gram duplication signal (the corpus-level C4 /
    "Deduplicating Training Data" measure, complementing the intra-doc
    :func:`repetition_docs`): document frequency per word n-gram, then
    per doc the share of gram positions whose gram occurs in ≥ ``min_df``
    distinct documents.

    Scale shape: pass 1 computes DISTINCT (doc, gram) per block (each doc
    lives in one block, so per-gram doc counts are additive) and the
    exchange carries one (gram, block) partial row — never the corpus.
    The ≥min_df "common" grams are the heavy hitters of a power-law
    distribution → small; broadcast into pass 2's streaming scorer.

    ``hashed=True`` is the 100 TB variant: the exchange and broadcast
    carry 64-bit gram hashes instead of raw strings (~10× fewer shuffle
    bytes at typical gram lengths; hash collisions across ~corpus-distinct
    grams are the usual 2⁻⁶⁴-scale risk). The default stays strings so
    DuckDB reproduces the whole computation; a test pins
    hashed ≡ strings at gate scale.
    """
    import pyarrow.compute as pc

    from ..functions.bloom import default_hash64
    from ..functions.dedup import _flat_ngrams

    docs = _docs(sf_dir, ["doc_id", "text"])

    def gram_key(grams: list[str]):
        if hashed:
            # int64 REINTERPRET of the 64-bit hash: the gram key is a
            # groupby key, and Ray's sort-boundary sampling round-trips
            # key samples through Python lists → Arrow int64 inference,
            # which overflows on uint64 values above 2^63 (observed at
            # 10M docs). Same uniqueness, sort-safe.
            return default_hash64(np.array(grams, dtype=object)).view(np.int64)
        return grams

    def df_partial(t: pa.Table) -> pa.Table:
        grams, offs = _flat_ngrams(t["text"].to_pylist(), n)
        seg = np.repeat(t["doc_id"].to_numpy(), np.diff(offs))
        part = (
            pd.DataFrame({"gram": gram_key(grams), "doc": seg})
            .drop_duplicates()
            .groupby("gram", sort=False)
            .size()
            .reset_index(name="df")
        )
        key_arr = (
            pa.array(part["gram"].to_numpy(np.int64), pa.int64())
            if hashed
            else pa.array(part["gram"], pa.string())
        )
        return pa.table(
            {"gram": key_arr,
             "df": pa.array(part["df"].to_numpy(np.int64))}
        )

    # hash-bucket exchange, NOT groupby(gram).aggregate: grams are mostly
    # distinct (groups ≈ rows), so the sort-based aggregate degenerates
    # into a global sort of every partial row — measured 40+ min at 10M
    # docs (0.56B partials) vs minutes for the 64-value bucket sort + one
    # vectorized pandas sum per bucket
    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("gram", sort=False, as_index=False)["df"].sum()

    from ..stages.keyed import keyed_map_blocks as _kmb

    gram_df = _kmb(
        docs.map_batches(df_partial, batch_format="pyarrow"),
        ["gram"], bucket_sum,
    )
    import ray

    common = pa.array(
        sorted(
            r["gram"]
            for r in gram_df.filter(expr=f"df >= {min_df}").take_all()
        ),
        pa.int64() if hashed else pa.string(),
    )
    # no-silent-caps: a min_df≥2 heavy-hitter set is power-law-small but
    # not guaranteed small — surface its size, and ship it via plasma
    # (one object-store read per node) instead of per-task closure capture
    _log.info(
        "crossdoc_gram_docs: broadcasting %d common grams (%.1f MB)",
        len(common), common.nbytes / 1e6,
    )
    common_ref = ray.put(common)

    def score(t: pa.Table) -> pa.Table:
        common = ray.get(common_ref)  # plasma read, cached per node
        grams, offs = _flat_ngrams(t["text"].to_pylist(), n)
        n_grams = np.diff(offs)
        keys = gram_key(grams)
        key_arr = (
            pa.array(keys, pa.int64()) if hashed
            else pa.array(keys, pa.string())
        )
        hit = pc.is_in(key_arr, value_set=common)
        seg = np.repeat(np.arange(len(t), dtype=np.int64), n_grams)
        n_common = np.bincount(
            seg, weights=hit.to_numpy(zero_copy_only=False), minlength=len(t)
        ).astype(np.int64)
        ratio = np.where(n_grams > 0, n_common / np.maximum(n_grams, 1), 0.0)
        # DuckDB rounds half AWAY from zero; np.round is half-even
        # (CLAUDE.md) — ratios are ≥ 0 so floor(x·10⁴ + ½) matches
        ratio4 = np.floor(ratio * 1e4 + 0.5) / 1e4
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(n_grams.astype(np.int64)),
                "n_common": pa.array(n_common),
                "common_ratio": pa.array(ratio4),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dupspan_docs(sf_dir: str, L: int = 5, min_df: int = 2) -> "rd.Dataset":
    """Duplicated-span coverage (the "Deduplicating Training Data"
    span-granularity measure): per doc, the fraction of its TOKENS lying
    inside at least one exact L-token span that occurs in ≥ ``min_df``
    distinct documents. Complements :func:`crossdoc_gram_docs` (which
    counts gram positions) by unioning overlapping spans into covered
    token intervals — the quantity a span-level deduper would remove.

    Same scale shape as crossdoc: distinct (doc, span) block partials →
    one tiny (span, block) exchange → broadcast heavy-hitter set →
    streaming coverage pass. Coverage is a vectorized difference array
    over the batch's flat token space (+1 at each common-span start, −1
    past its end, cumsum > 0 = covered), never a per-doc Python loop.
    """
    import re

    import pyarrow.compute as pc

    docs = _docs(sf_dir, ["doc_id", "text"])
    ws_re = re.compile(r"[ \t\n\r\f\v]+")

    def spans_of(texts):
        """(flat span strings, per-doc span offsets, per-doc token counts)."""
        grams: list[str] = []
        offs = [0]
        ntoks = []
        for txt in texts:
            toks = [x for x in ws_re.split(txt or "") if x]
            ntoks.append(len(toks))
            if len(toks) >= L:
                grams.extend(
                    " ".join(toks[i : i + L]) for i in range(len(toks) - L + 1)
                )
            offs.append(len(grams))
        return grams, np.asarray(offs, np.int64), np.asarray(ntoks, np.int64)

    def df_partial(t: pa.Table) -> pa.Table:
        grams, offs, _ = spans_of(t["text"].to_pylist())
        seg = np.repeat(t["doc_id"].to_numpy(), np.diff(offs))
        part = (
            pd.DataFrame({"g": grams, "d": seg})
            .drop_duplicates()
            .groupby("g", sort=False)
            .size()
            .reset_index(name="df")
        )
        return pa.table(
            {"g": pa.array(part["g"], pa.string()),
             "df": pa.array(part["df"].to_numpy(np.int64))}
        )

    # hash-bucket exchange instead of sort-based aggregate — see
    # crossdoc_gram_docs (groups ≈ rows makes groupby().aggregate a
    # global sort of every partial row)
    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("g", sort=False, as_index=False)["df"].sum()

    from ..stages.keyed import keyed_map_blocks as _kmb

    gram_df = _kmb(
        docs.map_batches(df_partial, batch_format="pyarrow"), ["g"], bucket_sum
    )
    import ray

    common = pa.array(
        sorted(r["g"] for r in gram_df.filter(expr=f"df >= {min_df}").take_all()),
        pa.string(),
    )
    _log.info(
        "dupspan_docs: broadcasting %d common spans (%.1f MB)",
        len(common), common.nbytes / 1e6,
    )
    common_ref = ray.put(common)

    def cover(t: pa.Table) -> pa.Table:
        common = ray.get(common_ref)  # plasma read, cached per node
        grams, offs, ntoks = spans_of(t["text"].to_pylist())
        nd = len(t)
        gram_counts = np.diff(offs)
        tok_off = np.concatenate([[0], np.cumsum(ntoks)])
        total = int(tok_off[-1])
        n_cov = np.zeros(nd, dtype=np.int64)
        if grams and total:
            hit = pc.is_in(pa.array(grams, pa.string()), value_set=common)
            hit = hit.to_numpy(zero_copy_only=False).astype(bool)
            seg = np.repeat(np.arange(nd, dtype=np.int64), gram_counts)
            local = np.arange(len(grams), dtype=np.int64) - offs[seg]
            starts = (tok_off[seg] + local)[hit]
            if len(starts):
                diff = np.zeros(total + L + 1, dtype=np.int64)
                np.add.at(diff, starts, 1)
                np.add.at(diff, starts + L, -1)
                covered = np.cumsum(diff[:total]) > 0
                tok_doc = np.repeat(np.arange(nd, dtype=np.int64), ntoks)
                n_cov = np.bincount(
                    tok_doc[covered], minlength=nd
                ).astype(np.int64)
        frac = np.where(ntoks > 0, n_cov / np.maximum(ntoks, 1), 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(ntoks),
                "n_covered": pa.array(n_cov),
                # half-away rounding to match DuckDB (frac >= 0)
                "dup_span_frac": pa.array(np.floor(frac * 1e4 + 0.5) / 1e4),
            }
        )

    return docs.map_batches(cover, batch_format="pyarrow")


def shuffle_docs(sf_dir: str, seed: str = "shuf42") -> "rd.Dataset":
    """Deterministic seeded corpus shuffle: every doc's 0-based position
    in the reproducible global training order (functions/shuffle.py —
    distributed rank over the md5 hash domain, no global row sort)."""
    from ..functions.shuffle import deterministic_shuffle

    return deterministic_shuffle(_docs(sf_dir, ["doc_id"]), seed=seed)


SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}

# corpus mixture: per-source sampling rates (data-mixing weights)
MIXTURE_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
MIXTURE_DEFAULT = 0.1


def mixture_docs(sf_dir: str) -> "rd.Dataset":
    """Data-mixing: reweight the corpus by per-source sampling rates
    (keep-all src0 down to 10% long-tail) — deterministic per doc_id,
    monotone in the rates, a pure streaming filter. Oracle-paired via the
    shared integer cutoffs."""
    from ..functions.sampling import mixture_sample

    return mixture_sample(
        _docs(sf_dir, ["doc_id", "source"]),
        rates=MIXTURE_RATES,
        group_col="source",
        id_col="doc_id",
        default_rate=MIXTURE_DEFAULT,
    ).select_columns(["doc_id", "source"])


def split_docs(sf_dir: str) -> "rd.Dataset":
    """Deterministic train/val/test assignment (90/5/5) — a pure function
    of doc_id, layout/order-independent, md5-reproducible by the SQL
    oracle. Streaming map; no shuffle."""
    from ..functions.sampling import assign_split

    return assign_split(
        _docs(sf_dir, ["doc_id"]), SPLIT_FRACTIONS, id_col="doc_id"
    ).select_columns(["doc_id", "split"])


def _distinct_per_doc_partial(splitter, key_name: str):
    """Batch fn: per-doc DISTINCT units (tokens/lines) → partial document
    frequencies — the first pass shared by tfidf_docs / line_dedup_docs.
    ``splitter(text_col) -> list array`` picks the unit."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        units = splitter(pc.fill_null(t["text"], ""))
        if isinstance(units, pa.ChunkedArray):
            units = units.combine_chunks()
        offs = np.asarray(units.offsets)
        seg = np.repeat(np.arange(len(t), dtype=np.int64), np.diff(offs))
        dfp = pd.DataFrame(
            {key_name: units.flatten().to_numpy(zero_copy_only=False), "seg": seg}
        )
        dfp = dfp[dfp[key_name] != ""].drop_duplicates()  # distinct per doc
        vc = dfp[key_name].value_counts()
        return pa.table(
            {
                key_name: pa.array(vc.index.to_numpy(), pa.string()),
                "df": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    return fn


def _token_mean_scorer(ref, out_col: str):
    """Actor class: broadcast (vocab, per-token weights) → per-doc mean of
    the weights over whitespace-token OCCURRENCES, round(4), zero-token
    docs omitted — shared by unigram_logprob_docs / tfidf_docs. Weights
    must be >= 0 (the rounding is half-away for non-negatives)."""
    import pyarrow.compute as pc

    import ray

    class Score:
        def __init__(self):
            self.vocab, self.w = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = pc.split_pattern_regex(
                pc.fill_null(t["text"], ""), pattern=r"\s+"
            )
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            offs = np.asarray(toks.offsets)
            flat = toks.flatten()
            nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            # empty boundary tokens (leading/trailing whitespace) are absent
            # from the vocab: index_in yields null there, and a null-bearing
            # to_numpy() becomes float64/NaN which cannot index the weights —
            # fill_null(0) first; the nonempty mask zeroes those positions
            idx = (
                pc.fill_null(pc.index_in(flat, value_set=self.vocab), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            w = np.where(nonempty, self.w[idx], 0.0)
            cs = np.concatenate([[0], np.cumsum(w)])
            seg_sum = cs[offs[1:]] - cs[offs[:-1]]
            csn = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
            seg_n = csn[offs[1:]] - csn[offs[:-1]]
            keep = seg_n > 0
            avg = seg_sum[keep] / seg_n[keep]
            avg = np.floor(avg * 10_000 + 0.5) / 10_000  # round 4, w >= 0
            return pa.table(
                {
                    "doc_id": t["doc_id"].filter(pa.array(keep)),
                    out_col: pa.array(avg, pa.float64()),
                }
            )

    return Score


def line_dedup_docs(sf_dir: str, min_df: int = 2) -> "rd.Dataset":
    """C4-style cross-document LINE dedup: any exact non-empty line that
    appears in ≥ ``min_df`` distinct documents is REMOVED from every
    document, and the text is reassembled (the boilerplate-line filter
    C4/Dolma run: nav menus, cookie banners, repeated headers).

    Two streaming passes over the corpus (the crossdoc_gram_docs shape):
    (1) distinct-per-doc line partials per batch → hash-bucket exchange →
    per-line document frequency → the ≥min_df "common" line set is
    broadcast once via ``ray.put`` (power-law small; size logged — the
    no-silent-caps rule); (2) a vectorized rewrite pass: flatten lines,
    mask common ones, rebuild the list offsets, ``binary_join`` with \\n —
    no Python loop over rows. Fully oracle-paired (list FILTER +
    array_to_string twin)."""
    import pyarrow.compute as pc

    from ..stages.keyed import keyed_map_blocks as _kmb

    df_partial = _distinct_per_doc_partial(
        lambda col: pc.split_pattern(col, pattern="\n"), "l"
    )

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l", sort=False, as_index=False)["df"].sum()

    line_df = _kmb(
        _docs(sf_dir, ["text"]).map_batches(
            df_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["l"],
        bucket_sum,
    )
    import ray

    common = pa.array(
        sorted(r["l"] for r in line_df.filter(expr=f"df >= {min_df}").take_all()),
        pa.string(),
    )
    _log.info(
        "line_dedup_docs: broadcasting %d common lines (%.1f MB)",
        len(common), common.nbytes / 1e6,
    )
    common_ref = ray.put(common)

    def rewrite(t: pa.Table) -> pa.Table:
        common = ray.get(common_ref)  # plasma read, cached per node
        lines = pc.split_pattern(pc.fill_null(t["text"], ""), pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        offs = np.asarray(lines.offsets)
        flat = lines.flatten()
        drop = pc.and_(
            pc.is_in(flat, value_set=common), pc.not_equal(flat, "")
        ).to_numpy(zero_copy_only=False)
        keep = ~drop
        nd = len(t)
        seg = np.repeat(np.arange(nd, dtype=np.int64), np.diff(offs))
        kept_counts = np.bincount(seg[keep], minlength=nd)
        new_offs = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
        new_list = pa.ListArray.from_arrays(
            pa.array(new_offs), flat.filter(pa.array(keep))
        )
        n_removed = (np.diff(offs) - kept_counts).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_clean": pc.binary_join(
                    new_list, pa.scalar("\n", pa.string())
                ),
                "n_removed": pa.array(n_removed),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        rewrite, batch_format="pyarrow"
    )


def tfidf_docs(sf_dir: str) -> "rd.Dataset":
    """Corpus TF-IDF rarity scoring: document frequency of every token
    over the corpus itself (distinct-per-doc partial counts per batch →
    one vocab-sized aggregate), broadcast idf = ln(N/df), then score
    every doc by the mean idf over its token OCCURRENCES (occurrence-
    weighted mean == tf-weighted tf-idf with tf normalized by length) —
    the classic rarity/quality signal next to the unigram-LM score.

    Scale note: same shape as unigram_logprob_docs — the aggregate and
    broadcast are VOCABULARY-sized (Heaps' law, sublinear), the scoring
    pass streams; zero-token docs are omitted (matching the SQL twin's
    GROUP BY). Oracle-paired: both engines sum per-doc idf terms in
    token order, so the float64 mean is bit-identical before the shared
    round(4)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    df_partial = _distinct_per_doc_partial(
        lambda col: pc.split_pattern_regex(col, pattern=r"\s+"), "token"
    )

    n_docs = float(_docs(sf_dir, ["doc_id"]).count())
    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    vocab = pa.array(counts["token"], pa.string())
    idf = np.log(n_docs / counts["df"].to_numpy(np.float64))
    import ray

    ref = ray.put((vocab, idf))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _token_mean_scorer(ref, "avg_idf"),
        batch_format="pyarrow",
        concurrency=default_pool(),
    )


def unigram_logprob_docs(sf_dir: str) -> "rd.Dataset":
    """Language-model quality scoring, KenLM-filter shaped: train a unigram
    LM on the corpus itself (one token-count aggregate — the vocab pattern,
    pre-combined per batch), broadcast the model, score every doc by the
    mean negative log-probability of its tokens. Zero-token docs are
    omitted (matching the SQL GROUP BY twin).

    Scale note: the broadcast is the VOCABULARY (sublinear in corpus size,
    Heaps' law — ~10M types ≈ 200 MB at web scale), never the corpus; the
    scoring pass streams. Fully oracle-paired (ln/avg reproduced in SQL,
    rounded to 4 dp on both sides)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def batch_counts(t: pa.Table) -> pa.Table:
        # no trim: empty edge tokens are filtered below, and Arrow's
        # unicode-aware trim would diverge from the oracle's RE2-only
        # tokenization on exotic whitespace (NBSP etc.)
        toks = pc.split_pattern_regex(pc.fill_null(t["text"], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(batch_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = float(counts["n"].sum())
    vocab = pa.array(counts["token"], pa.string())
    neg_logp = -np.log(counts["n"].to_numpy(np.float64) / total)
    import ray

    ref = ray.put((vocab, neg_logp))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _token_mean_scorer(ref, "avg_neg_logprob"),
        batch_format="pyarrow",
        concurrency=default_pool(),
    )


def pii_stats_docs(sf_dir: str) -> "rd.Dataset":
    """PII-density counts per doc (emails/phones/IPs — the scrub-or-drop
    gate); RE2 kernels with identical DuckDB twins."""
    from ..functions.textstats import pii_stats

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(pii_stats, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "n_emails", "n_phones", "n_ips"])
    )


# Sketch queries have no SQL oracle (hash functions DuckDB cannot reproduce
# / recall<1 by design). To keep regressions catchable at the driver's gate
# scale anyway, each asserts an internal invariant against an exact
# computation — but only when the input is small (the guard must never run
# the O(n²)/exact path at 100 TB).
_GUARD_MAX_ROWS = 20_000


def minhash_pairs_docs(sf_dir: str) -> "rd.Dataset":
    """MinHash-LSH near-dup pairs, fully SQL-oracle-paired since r5: the
    md5-based permutation family (functions/dedup.minhash_pairs_md5) is
    reproduced verbatim by DuckDB (sql_oracle.Q_MINHASH_PAIRS — same
    inlined constants, same 2³¹-1 modular arithmetic, banding on exact
    value tuples, exact string-set Jaccard). The vectorized 61-bit family
    (minhash_lsh_pairs) remains the throughput path used by dedup_near
    and the bench; this variant exists so the SKETCH itself is
    oracle-checked, not just guarded."""
    from ..functions.dedup import minhash_pairs_md5

    out = minhash_pairs_md5(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)

    def rounded(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "jaccard": pc.round(
                    t["jaccard"], 4, round_mode="half_towards_infinity"
                ),
            }
        )

    return out.map_batches(rounded, batch_format="pyarrow")


def simhash_pairs_docs(sf_dir: str) -> "rd.Dataset":
    """SimHash near-dup pairs, fully SQL-oracle-paired since r5: md5 token
    hashes (DuckDB-reproducible) + the 4×16-bit banding's pigeonhole
    guarantee (recall exactly 1 at hamming ≤ 3) mean the banded LSH result
    EQUALS the brute-force pair set the oracle computes."""
    return simhash_pairs(
        _docs(sf_dir, ["doc_id", "text"]), max_hamming=3, concurrency=None,
        hash_fn="md5",
    )


def embed_neardup(sf_dir: str, threshold: float = 0.35) -> "rd.Dataset":
    """Embedding-cosine near-dup pairs — EXACT, via the tiled block×block
    keyed exchange (functions/similarity.cosine_pairs_tiled): same answer
    as the brute-force broadcast but per-task memory is O(N / n_tiles × d),
    so the oracle-checked path is also the 100 TB path. The broadcast
    variant remains as a test-only cross-check
    (tests/test_similarity.py: tiled == brute). Output ordering is a
    distributed ``Dataset.sort`` — the pairs never gather on the driver
    (VERDICT r3: matters if thresholds ever go low)."""
    from ..functions.similarity import cosine_pairs_tiled

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_a": pa.compute.cast(t["vec_a"], pa.int64()),
                "vec_b": pa.compute.cast(t["vec_b"], pa.int64()),
                "sim": pa.compute.round(
                    pa.compute.cast(t["sim"], pa.float64()), 4,
                    round_mode="half_towards_infinity",
                ),
            }
        )

    return (
        cosine_pairs_tiled(
            rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
            threshold=threshold,
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort(["vec_a", "vec_b"])
    )


def embed_neardup_lsh(sf_dir: str, threshold: float = 0.35) -> "rd.Dataset":
    """LSH-bucketed variant (the 100 TB path; recall < 1 vs brute force by
    design — but DETERMINISTIC, so fully oracle-checkable).

    r5: the hyperplanes come from the md5 family
    (functions/similarity.md5_planes), bit-identical to what DuckDB's
    ``md5_number_lower`` reconstructs, so signatures, buckets, candidate
    pairs and verified sims are exactly reproducible in SQL
    (sql_oracle.Q_EMBED_NEARDUP_LSH) — same lever as minhash_pairs_docs /
    fingerprint_docs. The SQL twin omits the ``max_bucket`` cap, valid
    while the table fits one bucket-cap (gate scales: 500 rows ≤ 1000).

    Gate-scale guard kept (independent of the oracle): precision must be 1
    against brute force, and recall on near-identical pairs (sim ≥ 0.9,
    the regime LSH is tuned for) must be 1."""
    from ..functions.similarity import _norm, cosine_pairs_lsh

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_a": pa.compute.cast(t["vec_a"], pa.int64()),
                "vec_b": pa.compute.cast(t["vec_b"], pa.int64()),
                "sim": pa.compute.round(
                    pa.compute.cast(t["sim"], pa.float64()), 4,
                    round_mode="half_towards_infinity",
                ),
            }
        )

    out = (
        cosine_pairs_lsh(emb, threshold=threshold, plane_family="md5")
        .map_batches(finish, batch_format="pyarrow")
        .sort(["vec_a", "vec_b"])
    )
    if emb.count() <= _GUARD_MAX_ROWS:
        import numpy as np

        df = emb.to_pandas().sort_values("vec_id")
        m = _norm(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        ids = df["vec_id"].to_numpy()
        S = m @ m.T
        iu, ju = np.triu_indices(len(ids), 1)
        true_all = {
            (int(ids[i]), int(ids[j]))
            for i, j in zip(iu[S[iu, ju] >= threshold], ju[S[iu, ju] >= threshold])
        }
        strong = {
            (int(ids[i]), int(ids[j]))
            for i, j in zip(iu[S[iu, ju] >= 0.9], ju[S[iu, ju] >= 0.9])
        }
        got = out.to_pandas()
        found = set(zip(got["vec_a"], got["vec_b"]))
        assert found <= true_all, f"LSH false positives: {sorted(found - true_all)[:5]}"
        assert strong <= found, f"LSH missed near-identical pairs: {sorted(strong - found)[:5]}"
        return rd.from_pandas(got)
    return out


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    q = t.filter(pa.compute.equal(t["vec_id"], 0))["embedding"].to_pylist()[0]
    return np.asarray([q], dtype=np.float64)


def knn_vec0(sf_dir: str) -> pa.Table:
    """Top-10 cosine neighbours of vec_id=0 (incl. itself, sim≈1)."""
    got = knn_brute_force(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        _query_vec(sf_dir),
        k=10,
        concurrency=None,
    )
    return pa.table(
        {
            "vec_id": pa.array(got["vec_id"], pa.int64()),
            "sim": pa.compute.round(
                pa.array(got["sim"].to_numpy(), pa.float64()), 4,
                round_mode="half_towards_infinity",
            ),
        }
    )


def cluster_embeddings(sf_dir: str, n_clusters: int = 16) -> "rd.Dataset":
    """Embedding k-means clustering — every vector labeled with its
    cosine-nearest deterministic centroid plus the similarity to it (the
    cluster pass for cluster-balanced mixing / SemDeDup-style cluster
    dedup). Streaming assignment over broadcast centroids; fully
    oracle-paired via the shared unrolled k-means chain
    (sql_oracle.Q_CLUSTER_EMBEDDINGS)."""
    from ..functions.similarity import kmeans_assign_det

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return kmeans_assign_det(emb, n_clusters=n_clusters)


def semdedup_embeddings(sf_dir: str, tau: float = 0.35) -> "rd.Dataset":
    """SemDeDup-style semantic dedup over the embeddings table: cluster
    with the deterministic quantizer, drop within-cluster near-dups
    (cosine ≥ tau, keep the smallest vec_id). Survivors + their cluster;
    fully oracle-paired (sql_oracle.Q_SEMDEDUP_EMBEDDINGS)."""
    from ..functions.similarity import semdedup

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semdedup(emb, tau=tau)


def knn_ivf_vec0(sf_dir: str) -> pa.Table:
    """IVF approximate top-10 for vec_id=0 — r5: the DETERMINISTIC
    quantizer (functions/similarity.knn_ivf_det: first-k init, 9dp
    half-away quantization at every float decision point), which makes the
    whole approximate pipeline — k-means training, probe choice, cell
    assignment, pruned top-k — exactly reproducible in SQL
    (sql_oracle.Q_KNN_IVF, the unrolled-iteration twin). Flips the last
    rows-only registry entry to a full value-hash oracle."""
    from ..functions.similarity import knn_ivf_det

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    got = knn_ivf_det(
        emb,
        _query_vec(sf_dir),
        k=10,
        n_clusters=16,
        nprobe=6,
        concurrency=None,
    )
    if emb.count() <= _GUARD_MAX_ROWS:
        # gate-scale guard: IVF recall vs the exact answer ≥ 0.5 (the bound
        # tests/test_similarity.py asserts) — catches quantizer regressions.
        exact = knn_brute_force(
            rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
            _query_vec(sf_dir), k=10, concurrency=None,
        )
        recall = len(set(got["vec_id"]) & set(exact["vec_id"])) / 10
        assert recall >= 0.5, f"IVF recall {recall} < 0.5 vs exact top-10"
    return pa.table(
        {
            "vec_id": pa.array(got["vec_id"], pa.int64()),
            "sim": pa.array(got["sim"].to_numpy(), pa.float64()),
        }
    )

"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (shovel's only identity is the per-message CUID,
src/core/message.js:54); these are the standard corpus-dedup family built
Ray-Data-first:

- :func:`dedup_exact` — hash-partition on a key/content hash, keep the
  first (min doc_id) per group. One shuffle on the hash key.
- :func:`minhash_lsh_pairs` — shingle → minhash → band → bucket groupby →
  candidate pairs → Jaccard verify. Shuffle key = (band_id, band_hash);
  per-bucket work is bounded, hot buckets (boilerplate text) are capped and
  logged rather than exploding quadratically.
- :func:`simhash_pairs` — 64-bit simhash, bucketed by rotated prefixes so
  near hashes co-locate; verify by Hamming distance.
- :func:`ngram_jaccard` — exact n-gram Jaccard for a candidate pair list
  (the verify kernel, also exposed standalone).

All hashing is seeded/deterministic (no Python hash()), so re-runs and
retries produce identical results.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_MERSENNE = (1 << 61) - 1
_log = logging.getLogger("node_shovel_ray.dedup")


def add_content_hash(batch: pa.Table, column: str = "text", out: str = "content_hash") -> pa.Table:
    """64-bit content hash column (vectorized via pandas str hashing)."""
    s = batch.column(column).to_pandas()
    h = pd.util.hash_array(s.to_numpy(dtype=object), hash_key="0123456789123456")
    return batch.append_column(out, pa.array(h.astype(np.uint64), pa.uint64()))


def dedup_exact(
    ds: "ray.data.Dataset", key_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Exact dedup: keep the min-id row per identical key value.

    One hash-partition exchange on the key, then a vectorized
    ``drop_duplicates`` per block. At 100 TB, pass a 64-bit content-hash
    column as ``key_col`` (see :func:`add_content_hash`) to cut shuffle
    bytes; equal-hash groups are tiny so exact confirmation is free.
    """
    from ..stages.keyed import first_per_key_block, keyed_map_blocks

    return keyed_map_blocks(ds, [key_col], first_per_key_block([key_col], id_col))


def dedup_exact_counts(
    ds: "ray.data.Dataset", key_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(key, survivor id, dup count) per distinct key — oracle-friendly shape."""
    from ray.data.aggregate import Count, Min

    return ds.groupby(key_col).aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )


# ---------------------------------------------------------------- MinHash/LSH


def _shingles(tokens: list[str], k: int) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def _shingle_hash_sets(texts: list[str], k: int) -> list[np.ndarray]:
    """Each text → sorted unique uint64 shingle-hash array; ALL shingles of
    all texts hashed in one ``hash_array`` call (set semantics identical to
    ``_shingles`` up to 64-bit hash collisions, ~n²/2⁶⁴ — negligible)."""
    all_sh: list[str] = []
    offsets = [0]
    for t in texts:
        toks = (t or "").split()
        if toks:
            all_sh.extend(sorted(_shingles(toks, k)))
        offsets.append(len(all_sh))
    hs = (
        pd.util.hash_array(np.array(all_sh, dtype=object))
        if all_sh
        else np.array([], dtype=np.uint64)
    )
    return [
        np.unique(hs[offsets[i] : offsets[i + 1]]) for i in range(len(texts))
    ]


class MinHasher:
    """Actor-pool stage: text → num_perm minhash values (seeded, stateful).

    Hash family is built once per actor in __init__ (the shovel closure-state
    idiom, src/decoders/protobuf.js:49-63, as an actor pool)."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 42,
                 column: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.k = k
        self.num_perm = num_perm
        self.column = column
        self.id_col = id_col

    def _sig(self, text: str) -> np.ndarray:
        """Single-doc signature (kept for tests/oracles)."""
        return self._sig_batch([text])[0]

    def _sig_batch(self, texts: list[str]) -> np.ndarray:
        """Batch-vectorized signatures: hash EVERY doc's shingles in one
        ``pd.util.hash_array`` call, one (perms × shingles) modular GEMM,
        then per-doc segment mins via ``np.minimum.reduceat`` — ~10× the
        per-doc loop."""
        all_sh: list[str] = []
        offsets = [0]
        for t in texts:
            sh = _shingles((t or "").split(), self.k)
            all_sh.extend(sorted(sh))
            offsets.append(len(all_sh))
        out = np.full((len(texts), self.num_perm), _MERSENNE, dtype=np.int64)
        if not all_sh:
            return out
        base = (
            pd.util.hash_array(np.array(all_sh, dtype=object))
            .astype(np.uint64)
            & np.uint64(0x7FFFFFFFFFFFFFFF)
        ).astype(np.int64)
        # (a*x + b) mod p for all perms × all shingles of the whole batch
        prod = (self.a[:, None] * base[None, :] + self.b[:, None]) % _MERSENNE
        starts = np.array(offsets[:-1])
        nonempty = np.flatnonzero(np.diff(offsets) > 0)
        if len(nonempty):
            # empty docs are excluded → segment starts strictly increase and
            # each reduceat segment covers exactly one doc's shingles
            mins = np.minimum.reduceat(prod, starts[nonempty], axis=1)
            out[nonempty] = mins.T
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self._sig_batch(batch[self.column].to_pylist())
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sig": pa.array(list(sigs), pa.list_(pa.int64())),
            }
        )


def explode_bands(num_bands: int, rows_per_band: int):
    """minhash signature rows → (band_id, band_hash, doc_id) rows (flat-map)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(0).to_numpy()
        sigs = np.stack(batch["sig"].to_pandas().to_numpy())
        out_ids, out_band, out_hash = [], [], []
        for b in range(num_bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = pd.util.hash_array(
                np.ascontiguousarray(seg).view([("", seg.dtype)] * rows_per_band).ravel()
            )
            out_ids.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_hash.append(h.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids)),
                "band_id": pa.array(np.concatenate(out_band), pa.int32()),
                "band_hash": pa.array(np.concatenate(out_hash), pa.int64()),
            }
        )

    return fn


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    num_bands: int = 16,
    threshold: float = 0.5,
    k: int = 3,
    seed: int = 42,
    max_bucket: int = 200,
    concurrency=None,
    pair_dedup_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Near-duplicate candidate pairs with exact-Jaccard verification.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    Buckets larger than ``max_bucket`` are truncated (boilerplate guard) —
    at 100 TB a single viral template otherwise creates an O(n²) bucket.
    """
    rows_per_band = num_perm // num_bands
    texts = ds.select_columns([id_col, column])
    if concurrency is None:
        # the hash family is a few KB of state → ship a prebuilt instance
        # as a TASK closure instead of paying actor-pool spin-up (~2 s/pool
        # at toy scale, CLAUDE.md)
        sigs = texts.map_batches(
            MinHasher(num_perm=num_perm, k=k, seed=seed, column=column, id_col=id_col),
            batch_format="pyarrow",
        )
    else:
        sigs = texts.map_batches(
            MinHasher,
            fn_constructor_kwargs=dict(
                num_perm=num_perm, k=k, seed=seed, column=column, id_col=id_col
            ),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    bands = sigs.map_batches(
        explode_bands(num_bands, rows_per_band), batch_format="pyarrow"
    )

    from ..stages.keyed import first_per_key_block, keyed_map_blocks

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(g["doc_id"].to_numpy())[:max_bucket]
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            outs_a.append(ids[ia])
            outs_b.append(ids[ib])
        if not outs_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(outs_a), "doc_b": np.concatenate(outs_b)}
        )

    # candidates are output-bounded (max_bucket cap) — materialize once
    cand = keyed_map_blocks(bands, ["band_id", "band_hash"], bucket_pairs).materialize()
    # dedup pairs that collided in several bands: driver-side when the
    # candidate set is small (saves a whole keyed exchange), else a keyed
    # exchange on (doc_a, doc_b)
    if cand.count() <= pair_dedup_limit:
        df = cand.to_pandas().drop_duplicates(["doc_a", "doc_b"])
        cand = ray.data.from_pandas(df.reset_index(drop=True))
    else:
        cand = keyed_map_blocks(
            cand, ["doc_a", "doc_b"], first_per_key_block(["doc_a", "doc_b"])
        )

    verified = ngram_jaccard(
        cand, texts, id_col=id_col, column=column, k=k, concurrency=concurrency
    )
    return verified.filter(expr=f"jaccard >= {threshold}")


_M31 = 2147483647  # Mersenne prime 2^31-1: products stay < 2^62 → exact
# in int64 on the Ray side AND in DuckDB BIGINT, no wraparound divergence


def md5_perm_constants(num_perm: int = 16, seed: int = 42):
    """(A, B) for the md5-based minhash permutation family
    x → (A·x + B) mod 2³¹-1. Shared by :func:`minhash_pairs_md5` and the
    DuckDB oracle builder (pipelines/sql_oracle.minhash_pairs_sql), which
    embeds the same constants as SQL literals."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M31, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _M31, size=num_perm, dtype=np.int64)
    return a, b


def minhash_pairs_md5(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    num_bands: int = 8,
    threshold: float = 0.5,
    k: int = 3,
    seed: int = 42,
    pair_dedup_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """MinHash-LSH near-dup pairs with a DuckDB-REPRODUCIBLE hash family —
    the fully SQL-oracle-checkable twin of :func:`minhash_lsh_pairs`
    (which stays the high-throughput path: vectorized 61-bit family +
    bucket caps, used by dedup_near and the bench).

    Every stage is exactly mirrored in ANSI SQL (the
    ``md5_number_lower`` lever, CLAUDE.md): shingle base hash =
    ``md5_number_lower(shingle) mod 2³¹-1``; permutation j =
    ``(A_j·h + B_j) mod 2³¹-1`` (31-bit modulus keeps every product
    < 2⁶² — exact int64 both engines); signature = per-perm min over the
    doc's DISTINCT shingles; banding groups docs on the exact value
    TUPLE (no band-hash, so hash collisions cannot add candidates);
    verification = exact string-set Jaccard ≥ threshold. Same
    distributed shape as the fast path: signature/banding is one
    streaming map, candidate generation one keyed exchange on
    (band, v0..), pair-dedup one exchange, verify via
    :func:`ngram_jaccard` (exact mode)."""
    import hashlib
    import re

    rows_per_band = num_perm // num_bands
    perm_a, perm_b = md5_perm_constants(num_perm, seed)
    vcols = [f"v{i}" for i in range(rows_per_band)]
    ws_re = re.compile(r"[ \t\n\r\f\v]+")

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        sh_all: list[str] = []
        offsets = [0]
        for text in t[column].to_pylist():
            toks = [x for x in ws_re.split(text or "") if x]
            sh_all.extend(sorted(_shingles(toks, k)))
            offsets.append(len(sh_all))
        base = np.array(
            [
                int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
                % _M31
                for s in sh_all
            ],
            dtype=np.int64,
        )
        sigs = np.full((len(ids), num_perm), _M31, dtype=np.int64)
        starts = np.array(offsets[:-1])
        nonempty = np.flatnonzero(np.diff(offsets) > 0)
        if len(nonempty) and len(base):
            prod = (perm_a[:, None] * base[None, :] + perm_b[:, None]) % _M31
            sigs[nonempty] = np.minimum.reduceat(prod, starts[nonempty], axis=1).T
        cols = {
            id_col: pa.array(np.repeat(ids[nonempty], num_bands)),
            "band_id": pa.array(
                np.tile(np.arange(num_bands, dtype=np.int32), len(nonempty)),
                pa.int32(),
            ),
        }
        seg = sigs[nonempty]  # (docs, perms) → per-band value columns
        for r in range(rows_per_band):
            vals = seg[:, [b * rows_per_band + r for b in range(num_bands)]]
            cols[vcols[r]] = pa.array(vals.ravel())
        return pa.table(cols)

    from ..stages.keyed import first_per_key_block, keyed_map_blocks

    bands = ds.select_columns([id_col, column]).map_batches(
        band_rows, batch_format="pyarrow"
    )
    keys = ["band_id", *vcols]

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        for _, g in df.groupby(keys, sort=False):
            ids = np.sort(g[id_col].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) > 1000:
                _log.info("minhash_pairs_md5: hot bucket of %d docs", len(ids))
            ia, ib = np.triu_indices(len(ids), k=1)
            outs_a.append(ids[ia])
            outs_b.append(ids[ib])
        if not outs_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(outs_a), "doc_b": np.concatenate(outs_b)}
        )

    cand = keyed_map_blocks(bands, keys, bucket_pairs).materialize()
    if cand.count() <= pair_dedup_limit:
        df = cand.to_pandas().drop_duplicates(["doc_a", "doc_b"])
        cand = ray.data.from_pandas(df.reset_index(drop=True))
    else:
        cand = keyed_map_blocks(
            cand, ["doc_a", "doc_b"], first_per_key_block(["doc_a", "doc_b"])
        )

    verified = ngram_jaccard(
        cand, ds.select_columns([id_col, column]), id_col=id_col,
        column=column, k=k, exact=True,
    )
    return verified.filter(expr=f"jaccard >= {threshold}")


def ngram_jaccard(
    pairs: "ray.data.Dataset",
    texts: "ray.data.Dataset",
    id_col: str = "doc_id",
    column: str = "text",
    k: int = 3,
    concurrency=None,
    broadcast_limit: int = 200_000,
    exact: bool = False,
) -> "ray.data.Dataset":
    """Exact k-gram Jaccard for a candidate pair list — the verify kernel,
    also exposed standalone: (doc_a, doc_b) rows + a texts table →
    (doc_a, doc_b, jaccard).

    Never materializes the corpus, and (since r5) never gathers the pair
    list on the driver when it is large:

    - ``≤ broadcast_limit`` PAIRS → the distinct candidate doc-id set is
      derived on the driver (bounded by the limit), ``ray.put`` once, and
      stream-filters the corpus down to candidate texts which are then
      broadcast into the verify task (memory O(candidates), never
      O(corpus));
    - else → NO driver-side keyset at all: the two distributed keyed
      joins attach text_a / text_b onto the pair rows directly — the join
      IS the semi-join (per-bucket merge keeps only pair rows), per-bucket
      memory bounded by bucket size, keyed on the id column's native
      Arrow type (string and integer doc ids both flow through).
    """
    import ray

    pairs = pairs.materialize()  # reused: count + verify/join passes
    if pairs.count() <= broadcast_limit:
        cand_ids = pairs.select_columns(["doc_a", "doc_b"]).to_pandas()
        # semi-join keyset on the column's NATIVE type (string ids work
        # here; only the distributed _attach_text path requires casting)
        ids = (
            np.unique(
                np.concatenate(
                    [cand_ids["doc_a"].to_numpy(), cand_ids["doc_b"].to_numpy()]
                )
            )
            if len(cand_ids)
            else np.array([], dtype=np.int64)
        )
        idset_ref = ray.put(pa.array(ids))

        def filter_to_candidates(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idset = ray.get(idset_ref)  # plasma read, cached per node
            col = t[id_col]
            vs = idset if idset.type == col.type else idset.cast(col.type)
            return t.filter(pc.is_in(col, value_set=vs))

        cand_texts = texts.map_batches(filter_to_candidates, batch_format="pyarrow")
    else:
        ids = None
        cand_texts = None  # big-pair path joins against the full corpus

    def jaccard_frame(b: pd.DataFrame, ta_col: str, tb_col: str) -> pd.DataFrame:
        if not len(b):
            out = b[["doc_a", "doc_b"]].copy()  # keep upstream dtypes
            out["jaccard"] = pd.Series([], dtype="float64")
            return out
        # default: hash every distinct text's shingles in ONE hash_array
        # call, then per-pair C-level intersect on sorted uint64 arrays.
        # exact=True swaps in Python string sets — no 64-bit-collision
        # caveat, required by the SQL-oracle-paired md5 variant (pairs are
        # a sliver of the corpus, so the per-pair set ops are cheap).
        texts = np.concatenate(
            [b[ta_col].fillna("").to_numpy(object), b[tb_col].fillna("").to_numpy(object)]
        )
        uniq, inv = np.unique(texts, return_inverse=True)
        if exact:
            import re

            # explicit class, not str.split(): SQL's string_split_regex
            # must tokenize identically (str.split also eats \xa0 etc.)
            ws_re = re.compile(r"[ \t\n\r\f\v]+")
            hashes = [
                _shingles([x for x in ws_re.split(t or "") if x], k)
                for t in uniq
            ]
        else:
            hashes = _shingle_hash_sets(list(uniq), k)
        n = len(b)
        jac = np.empty(n, dtype=np.float64)
        for i, (xa, xb) in enumerate(zip(inv[:n], inv[n:])):
            ha, hb = hashes[xa], hashes[xb]
            if exact:
                inter = len(ha & hb)
            else:
                inter = np.intersect1d(ha, hb, assume_unique=True).size
            union = len(ha) + len(hb) - inter
            jac[i] = inter / (union or 1)
        out = b[["doc_a", "doc_b"]].copy()
        out["jaccard"] = jac
        return out

    from ..stages.keyed import default_num_blocks

    if cand_texts is not None:
        # broadcast path: only CANDIDATE texts ship (O(candidates) memory),
        # via plasma (one object-store read per node, not per task spec)
        tmap_ref = ray.put(cand_texts.to_pandas().set_index(id_col)[column])

        def verify(b: pd.DataFrame) -> pd.DataFrame:
            tmap = ray.get(tmap_ref)
            b = b.copy()
            b["_ta"] = b["doc_a"].map(tmap)
            b["_tb"] = b["doc_b"].map(tmap)
            return jaccard_frame(b, "_ta", "_tb")

        return pairs.map_batches(verify, batch_format="pandas")

    # big-pair path: no driver-side keyset — the keyed joins against the
    # full corpus ARE the semi-join (per-bucket merge keeps only pair
    # rows); one honest corpus exchange per attached side
    nb = default_num_blocks()
    joined = _attach_text(
        pairs.repartition(nb), texts, "doc_a", "_text_a", id_col,
        column, num_blocks=nb,
    )
    joined = _attach_text(
        joined, texts, "doc_b", "_text_b", id_col, column, num_blocks=nb,
    )
    return joined.map_batches(
        lambda b: jaccard_frame(b, "_text_a", "_text_b"), batch_format="pandas"
    )


def ngram_contamination(
    docs: "ray.data.Dataset",
    bench_grams: "pa.Array",
    column: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> "ray.data.Dataset":
    """Benchmark-contamination flagging by n-gram OVERLAP (the standard
    eval-decontamination rule — any shared word n-gram, not just exact
    text match): returns the ids of docs sharing ≥1 n-gram with the
    broadcast benchmark n-gram set.

    The benchmark side is small (an eval set) → its distinct n-gram
    strings broadcast into a streaming membership filter (``pc.is_in`` on
    exact strings — no hash-collision false flags); the corpus never
    shuffles. Build ``bench_grams`` with :func:`text_ngrams`."""
    import pyarrow.compute as pc

    def flag(t: pa.Table) -> pa.Table:
        grams, offs = _flat_ngrams(t[column].to_pylist(), n)
        if len(grams):
            hit = pc.is_in(
                pa.array(grams, pa.string()), value_set=bench_grams
            ).to_numpy(zero_copy_only=False)
            cs = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
            any_hit = (cs[offs[1:]] - cs[offs[:-1]]) > 0
        else:
            any_hit = np.zeros(len(t), dtype=bool)
        return t.filter(pa.array(any_hit)).select([id_col])

    return docs.map_batches(flag, batch_format="pyarrow")


def text_ngrams(texts: list[str], n: int = 5) -> "pa.Array":
    """Distinct word n-grams of ``texts`` as an Arrow string array (the
    broadcast side for :func:`ngram_contamination`)."""
    grams, _ = _flat_ngrams(texts, n)
    return pa.array(sorted(set(grams)), pa.string())


def _flat_ngrams(texts: list[str], n: int):
    """texts → (flat n-gram strings, per-text offsets); whitespace split on
    the explicit ASCII class (RE2/Python-identical, same as fingerprint)."""
    import re

    ws_re = re.compile(r"[ \t\n\r\f\v]+")
    grams: list[str] = []
    offsets = [0]
    for t in texts:
        toks = [x for x in ws_re.split(t or "") if x]
        if len(toks) >= n:
            grams.extend(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
        offsets.append(len(grams))
    return grams, np.asarray(offsets, dtype=np.int64)


def _attach_text(
    pairs: "ray.data.Dataset",
    texts: "ray.data.Dataset",
    key_col: str,
    out_col: str,
    id_col: str,
    column: str,
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Distributed hash-join: attach ``texts[column]`` onto ``pairs`` rows by
    ``pairs[key_col] == texts[id_col]``.

    Union-then-bucket: both sides are normalized to one schema with a join
    key and a side marker, hash-partitioned on the key (one keyed exchange
    over candidate rows + candidate texts only), then merged per bucket with
    a vectorized pandas map. Per-bucket memory is bounded by bucket size.
    The join key keeps the pairs column's NATIVE Arrow type (string / int /
    whatever — the texts id is cast to it), so non-integer doc ids flow
    through the distributed path too."""
    import pyarrow.compute as pc

    from ..stages.keyed import keyed_map_blocks

    ptypes = _arrow_types(pairs)
    key_t = ptypes[key_col]
    carry = list(ptypes)
    text_carry = [c for c in carry if c.startswith("_text_")]
    other_carry = [c for c in carry if c not in text_carry]
    # every bucket emits this one Arrow schema (pandas widens int carry
    # columns unioned with the texts side's nulls; the Arrow conversion
    # restores the declared types uniformly — nulls can't appear: only
    # pair rows survive the merge)
    out_schema = pa.schema([(c, ptypes[c]) for c in carry] + [(out_col, pa.string())])

    def norm_pairs(t: pa.Table) -> pa.Table:
        cols: dict = {"_jk": t[key_col]}
        for c in other_carry:
            cols[c] = t[c]
        for c in text_carry:
            cols[c] = t[c]
        cols["_txt"] = pa.nulls(len(t), pa.string())
        cols["_side"] = pa.array(np.zeros(len(t), dtype=np.int8))
        return pa.table(cols)

    def norm_texts(t: pa.Table) -> pa.Table:
        cols: dict = {"_jk": pc.cast(t[id_col], key_t)}
        for c in other_carry:
            cols[c] = pa.nulls(len(t), ptypes[c])
        for c in text_carry:
            cols[c] = pa.nulls(len(t), pa.string())
        cols["_txt"] = t[column]
        cols["_side"] = pa.array(np.ones(len(t), dtype=np.int8))
        return pa.table(cols)

    u = pairs.map_batches(norm_pairs, batch_format="pyarrow").union(
        texts.map_batches(norm_texts, batch_format="pyarrow")
    )

    def merge(df: pd.DataFrame) -> pa.Table:
        is_txt = df["_side"] == 1
        tmap = df.loc[is_txt].set_index("_jk")["_txt"]
        out = df.loc[~is_txt, ["_jk", *carry]].copy()
        out[out_col] = out["_jk"].map(tmap)
        return pa.Table.from_pandas(
            out.drop(columns=["_jk"]), schema=out_schema, preserve_index=False
        )

    return keyed_map_blocks(u, ["_jk"], merge, num_blocks=num_blocks)


def _arrow_types(ds: "ray.data.Dataset") -> dict:
    """{column: pa.DataType} for a Dataset whose blocks may be Arrow OR
    pandas (pandas-block schemas report numpy dtypes / ``object``;
    ``object`` columns are strings under this engine's conventions)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return dict(zip(base.names, base.types))
    out = {}
    for name, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            out[name] = t
        elif t is object or t == np.dtype(object):
            out[name] = pa.string()
        else:
            out[name] = pa.from_numpy_dtype(np.dtype(t))
    return out


# ------------------------------------------------------------------- SimHash

# per-byte popcount table (numpy < 2 has no bitwise_count)
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a byte lookup table."""
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return _POP8[b].reshape(len(x), 8).sum(axis=1).astype(np.int64)


class SimHasher:
    """text → 64-bit simhash (token-feature weighted bit vote), stateful seed.

    Batch-vectorized like MinHasher: hash EVERY doc's tokens in one
    ``pd.util.hash_array`` call, expand to a (tokens × 64) bit matrix, and
    take per-doc majority votes via ``np.add.reduceat`` segment sums —
    no per-doc Python work."""

    def __init__(self, seed: int = 42, column: str = "text", id_col: str = "doc_id",
                 hash_fn: str = "pd"):
        self.column = column
        self.id_col = id_col
        self.hash_key = f"{seed:016d}"[:16]
        # "md5": DuckDB-reproducible token hashes (md5_number_lower) +
        # the explicit whitespace class, so the whole simhash — and with
        # the 4×16-bit banding's guaranteed recall at hamming ≤ 3, the
        # whole PAIR SET — is SQL-oracle-checkable. "pd" stays the fast
        # vectorized path.
        self.hash_fn = hash_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        ws_re = re.compile(r"[ \t\n\r\f\v]+")
        texts = batch[self.column].to_pylist()
        all_toks: list[str] = []
        offsets = [0]
        for t in texts:
            if self.hash_fn == "md5":
                all_toks.extend(x for x in ws_re.split(t or "") if x)
            else:
                all_toks.extend((t or "").split())
            offsets.append(len(all_toks))
        out = np.zeros(len(texts), dtype=np.uint64)
        if all_toks:
            if self.hash_fn == "md5":
                import hashlib

                hs = np.array(
                    [
                        int.from_bytes(
                            hashlib.md5(x.encode()).digest()[8:16], "little"
                        )
                        for x in all_toks
                    ],
                    dtype=np.uint64,
                )
            else:
                hs = pd.util.hash_array(
                    np.array(all_toks, dtype=object), hash_key=self.hash_key
                ).astype(np.uint64)
            # bit i of each hash via unpackbits on the little-endian byte
            # view — orders of magnitude faster than a broadcast uint64 shift
            bits = np.unpackbits(
                hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int32)  # (tokens, 64), column i == (h >> i) & 1
            starts = np.array(offsets[:-1])
            seglen = np.diff(offsets)
            nonempty = np.flatnonzero(seglen > 0)
            if len(nonempty):
                # empty docs excluded → nonempty starts strictly increase and
                # each reduceat segment covers exactly one doc's tokens
                ones = np.add.reduceat(bits, starts[nonempty], axis=0)
                # vote >= 0  ⟺  2*ones >= n_tokens (votes = 2*ones - n)
                maj = (2 * ones) >= seglen[nonempty][:, None]
                packed = np.packbits(maj[:, ::-1], axis=1).view(">u8").ravel()
                out[nonempty] = packed.astype(np.uint64)
        return pa.table(
            {self.id_col: batch[self.id_col], "simhash": pa.array(out, pa.uint64())}
        )


def simhash_pairs(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
    concurrency=None,
    hash_fn: str = "pd",
) -> "ray.data.Dataset":
    """Near-dup pairs by simhash: bucket on 4×16-bit bands (any pair within
    Hamming distance 3 shares at least one exact 16-bit band — pigeonhole,
    so recall is EXACTLY 1 at max_hamming ≤ 3 and the banded result equals
    brute force), verify Hamming distance inside buckets.

    ``hash_fn="md5"`` makes the token hashes DuckDB-reproducible
    (md5_number_lower), which — combined with the guaranteed recall —
    makes the whole pair set SQL-oracle-checkable
    (sql_oracle.Q_SIMHASH_PAIRS: brute-force cross join over the same
    signatures)."""
    if concurrency is None:
        # simhash state (seeded hash key) is tiny → task closure, no pool
        sigs = ds.select_columns([id_col, column]).map_batches(
            SimHasher(seed=seed, column=column, id_col=id_col, hash_fn=hash_fn),
            batch_format="pyarrow",
        )
    else:
        sigs = ds.select_columns([id_col, column]).map_batches(
            SimHasher,
            fn_constructor_kwargs=dict(
                seed=seed, column=column, id_col=id_col, hash_fn=hash_fn
            ),
            batch_format="pyarrow",
            concurrency=concurrency,
        )

    def bandify(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy()
        ids = t.column(0).to_numpy()
        outs = []
        for b in range(4):
            seg = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            outs.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids),
                        "band_id": pa.array(np.full(len(ids), b, np.int32)),
                        "band_val": pa.array(seg),
                        "simhash": pa.array(h, pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    bands = sigs.map_batches(bandify, batch_format="pyarrow")

    from ..stages.keyed import first_per_key_block, keyed_map_blocks

    def buckets(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for _, g in df.groupby(["band_id", "band_val"], sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            hs = g["simhash"].to_numpy().astype(np.uint64)
            ia, ib = np.triu_indices(len(ids), k=1)
            x = hs[ia] ^ hs[ib]
            ham = _popcount64(x)
            keep = ham <= max_hamming
            out["doc_a"].append(ids[ia][keep])
            out["doc_b"].append(ids[ib][keep])
            out["hamming"].append(ham[keep])
        if not out["doc_a"]:
            return pd.DataFrame(
                {k: pd.Series([], dtype="int64") for k in ("doc_a", "doc_b", "hamming")}
            )
        return pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})

    pairs = keyed_map_blocks(bands, ["band_id", "band_val"], buckets)
    return keyed_map_blocks(
        pairs, ["doc_a", "doc_b"], first_per_key_block(["doc_a", "doc_b"])
    )


def connected_components(pairs: pd.DataFrame, a: str = "doc_a", b: str = "doc_b") -> dict:
    """Union-find over a (small) duplicate-pair edge list → {doc_id: root}.

    The pair list is output-bounded (bucket caps), so driver-side
    union-find is the right tool even at 100 TB corpus scale; only ids in
    some pair appear in the result.
    """
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    seen: set = set()
    for x, y in zip(pairs[a], pairs[b]):
        seen.add(x)
        seen.add(y)
        rx, ry = find(x), find(y)
        if rx != ry:
            # smaller id wins → the survivor is the min id of the component
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    return {x: find(x) for x in seen}


def connected_components_ds(
    pairs: "ray.data.Dataset",
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 64,
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Distributed connected components over a duplicate-pair edge list:
    a Dataset of ``(v, root)`` rows, ``root`` = the component's min id
    (every vertex gets a row, roots map to themselves — same contract as
    the driver :func:`connected_components`).

    The scale path for dup-heavy corpora where the pair graph is billions
    of edges and the driver union-find cannot hold it. Algorithm:
    alternating **large-star / small-star** contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the state
    is ONLY the edge list, rewritten in place each round:

    - large-star (group by each endpoint, both directions): connect every
      strictly-larger neighbor of ``u`` to ``min(N(u) ∪ {u})``;
    - small-star (group by the larger endpoint): connect every not-larger
      neighbor and ``u`` itself to the group min.

    Each phase is ONE keyed exchange over (int64, int64) rows in a single
    linear plan; O(log² n) rounds worst case, 2–4 on real dup graphs.
    Deliberately NOT label propagation: that shape needs Dataset.union of
    two branches per round, and union-inside-a-loop compounds Ray 2.49
    driver scheduling time ~2× per round even with materialized inputs
    (measured on this host; a linear chain + per-round materialize stays
    flat). The driver only ever sees three scalars per round (edge count
    + two salted hash sums for the fixpoint test).
    """
    import time as _time

    from ..stages.keyed import default_num_blocks, keyed_map_blocks

    nb = num_blocks or max(8, default_num_blocks() // 4)
    empty = ray.data.from_arrow(
        pa.table({"v": pa.array([], pa.int64()), "root": pa.array([], pa.int64())})
    )
    if pairs.count() == 0:
        return empty

    # canonical (hi, lo) edges, self-pairs dropped, deduped per bucket
    def canon(df: pd.DataFrame) -> pd.DataFrame:
        sa = df[a].to_numpy(np.int64)
        sb = df[b].to_numpy(np.int64)
        keep = sa != sb
        sa, sb = sa[keep], sb[keep]
        return pd.DataFrame(
            {"u": np.maximum(sa, sb), "v": np.minimum(sa, sb)}
        ).drop_duplicates()

    edges = keyed_map_blocks(
        pairs.map_batches(canon, batch_format="pandas"),
        ["u"],
        lambda df: df.drop_duplicates(),
        num_blocks=nb,
    ).materialize()

    def doubled(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": np.concatenate(
                    [df["u"].to_numpy(np.int64), df["v"].to_numpy(np.int64)]
                ),
                "v": np.concatenate(
                    [df["v"].to_numpy(np.int64), df["u"].to_numpy(np.int64)]
                ),
            }
        )

    def large_star(df: pd.DataFrame) -> pd.DataFrame:
        # per u: m = min(N(u) ∪ {u}); emit (v, m) for v > u (each undirected
        # edge emits exactly once, from its smaller endpoint's group)
        if not len(df):
            return df
        m = np.minimum(
            df.groupby("u", sort=False)["v"].transform("min").to_numpy(np.int64),
            df["u"].to_numpy(np.int64),
        )
        vv = df["v"].to_numpy(np.int64)
        keep = vv > df["u"].to_numpy(np.int64)
        return pd.DataFrame({"u": vv[keep], "v": m[keep]}).drop_duplicates()

    def small_star(df: pd.DataFrame) -> pd.DataFrame:
        # input is (hi, lo); per hi-group: m = min(neighbors); emit (w, m)
        # for every neighbor w ≠ m plus (hi, m) itself
        if not len(df):
            return df
        uu = df["u"].to_numpy(np.int64)
        vv = df["v"].to_numpy(np.int64)
        m = df.groupby("u", sort=False)["v"].transform("min").to_numpy(np.int64)
        keep = vv != m
        heads = df.groupby("u", sort=False)["v"].min()
        out = pd.DataFrame(
            {
                "u": np.concatenate([vv[keep], heads.index.to_numpy(np.int64)]),
                "v": np.concatenate([m[keep], heads.to_numpy(np.int64)]),
            }
        )
        return out.drop_duplicates()

    def fingerprint(t: pa.Table) -> pa.Table:
        # two independently-salted 31-bit row hashes (fixpoint detection:
        # equal count + equal double hash sums ⇒ same edge set, p≈2⁻⁶²)
        uu = t["u"].to_pandas().to_numpy(np.uint64)
        vv = t["v"].to_pandas().to_numpy(np.uint64)
        mix = uu * np.uint64(0x9E3779B97F4A7C15) + vv
        h1 = pd.util.hash_array(mix) & np.uint64(0x7FFFFFFF)
        h2 = pd.util.hash_array(mix + np.uint64(0x5BF03635)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {"h1": pa.array(h1.astype(np.int64)), "h2": pa.array(h2.astype(np.int64))}
        )

    prev = None
    for it in range(max_iters):
        _t0 = _time.monotonic()
        # large-star needs both directions grouped; small-star re-groups the
        # (hi, lo) output by hi — one linear chain, two keyed exchanges
        ls = keyed_map_blocks(
            edges.map_batches(doubled, batch_format="pandas"),
            ["u"], large_star, num_blocks=nb,
        )
        edges = keyed_map_blocks(ls, ["u"], small_star, num_blocks=nb).materialize()
        fp = edges.map_batches(fingerprint, batch_format="pyarrow")
        sig = (edges.count(), fp.sum("h1") or 0, fp.sum("h2") or 0)
        _log.info(
            "connected_components_ds round %d: %d edges (%.1fs)",
            it, sig[0], _time.monotonic() - _t0,
        )
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components_ds did not converge in {max_iters} rounds"
        )

    # fixpoint edge list IS (child, root); add (root, root) self rows —
    # at fixpoint every parent is a root, so distinct(v) = the root set
    def with_roots(df: pd.DataFrame) -> pd.DataFrame:
        roots = np.unique(df["v"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "v": np.concatenate([df["u"].to_numpy(np.int64), roots]),
                "root": np.concatenate([df["v"].to_numpy(np.int64), roots]),
            }
        )

    return keyed_map_blocks(edges, ["v"], with_roots, num_blocks=nb)


def _anti_join_ids(
    ds: "ray.data.Dataset",
    drops: "ray.data.Dataset",
    id_col: str,
    drop_col: str = "v",
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Distributed anti-join: drop every ``ds`` row whose ``id_col`` appears
    in ``drops[drop_col]`` — the fallback when the drop set is too large to
    broadcast. One keyed exchange of the corpus rows + drop markers; per-
    bucket memory is bounded by bucket size."""
    from ..stages.keyed import keyed_map_blocks

    types = _arrow_types(ds)
    cols = list(types)
    out_schema = pa.schema([(c, types[c]) for c in cols])
    key_t = types[id_col]

    def norm_rows(t: pa.Table) -> pa.Table:
        d = {"_jk": t[id_col]}
        for c in cols:
            d[c] = t[c]
        d["_drop"] = pa.array(np.zeros(len(t), np.int8))
        return pa.table(d)

    def norm_drops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = {"_jk": pc.cast(t[drop_col], key_t)}
        for c in cols:
            d[c] = pa.nulls(len(t), types[c])
        d["_drop"] = pa.array(np.ones(len(t), np.int8))
        return pa.table(d)

    u = ds.map_batches(norm_rows, batch_format="pyarrow").union(
        drops.map_batches(norm_drops, batch_format="pyarrow")
    )

    def merge(df: pd.DataFrame) -> pa.Table:
        is_drop = df["_drop"] == 1
        dropset = set(df.loc[is_drop, "_jk"])
        keep = df.loc[~is_drop & ~df["_jk"].isin(dropset), cols]
        return pa.Table.from_pandas(keep, schema=out_schema, preserve_index=False)

    return keyed_map_blocks(u, ["_jk"], merge, num_blocks=num_blocks)


def dedup_near(
    ds: "ray.data.Dataset",
    column: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    cc_driver_limit: int = 2_000_000,
    drop_broadcast_limit: int = 5_000_000,
    pairs: "ray.data.Dataset | None" = None,
    **lsh_kwargs,
) -> "ray.data.Dataset":
    """End-to-end near-duplicate REMOVAL: MinHash-LSH pairs → connected
    components → keep only each component's min-id representative.

    Scale shape: the pair list stays a Dataset. Up to ``cc_driver_limit``
    pairs the components come from driver union-find (fastest at eval
    scale); above it, :func:`connected_components_ds` runs fully
    distributed — the driver never holds the edge list. The drop set
    (non-representative members) broadcasts into a streaming filter via
    ``ray.put`` while it fits ``drop_broadcast_limit``; a dup-heavier
    corpus falls back to a distributed anti-join (one keyed exchange of
    the corpus — the honest cost once drops are billions of rows).

    ``pairs``: pre-computed (doc_a, doc_b) rows — pass
    :func:`minhash_pairs_md5` output for the SQL-oracle-paired family;
    default builds the fast 61-bit :func:`minhash_lsh_pairs`."""
    import ray

    import pyarrow.compute as pc

    if pairs is None:
        pairs = minhash_lsh_pairs(
            ds, column=column, id_col=id_col, threshold=threshold, **lsh_kwargs
        )
    pairs = pairs.materialize()
    n_pairs = pairs.count()

    if n_pairs <= cc_driver_limit:
        roots = connected_components(pairs.to_pandas())
        drop_arr = np.array(
            sorted(x for x, r in roots.items() if x != r), dtype=np.int64
        )
        n_drop = len(drop_arr)
    else:
        lab = connected_components_ds(pairs).materialize()
        drops_ds = lab.map_batches(
            lambda t: t.filter(pc.not_equal(t["v"], t["root"])).select(["v"]),
            batch_format="pyarrow",
        ).materialize()
        n_drop = drops_ds.count()
        if n_drop > drop_broadcast_limit:
            _log.info(
                "dedup_near: %d drops exceed broadcast limit %d — "
                "distributed anti-join", n_drop, drop_broadcast_limit,
            )
            return _anti_join_ids(ds, drops_ds, id_col)
        drop_arr = np.sort(
            drops_ds.to_pandas()["v"].to_numpy(np.int64)
        )  # bounded by drop_broadcast_limit

    _log.info("dedup_near: dropping %d near-duplicate docs (broadcast)", n_drop)
    drop_ref = ray.put(pa.array(drop_arr, pa.int64()))

    def keep(t: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)  # plasma read, cached per node
        return t.filter(
            pc.invert(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=drop))
        )

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

"""Similarity & near-duplicate machinery: cosine, MinHash, SimHash.

Spark-first design:

- cosine / dot product: higher-order functions ``zip_with`` + ``aggregate``
  — JVM-side, no UDF, left-to-right double accumulation (deterministic and
  reproducible by the DuckDB oracle's ``list_sum(list_transform(...))``).
- MinHash signatures: the per-permutation hash is ``md5(i || '|' ||
  shingle)`` and the signature element is the *lexicographic min* of those
  hex digests — a valid min-wise hash family that needs no integer
  parsing, so it is bit-portable across engines. Banding on concatenated
  signature pairs gives the LSH bucket join.
- SimHash: 64-bit, implemented as a vectorized pandas UDF (bit-twiddling
  is where built-ins genuinely run out) — Arrow-batched, no per-row Python
  in the driver path.

At 100 TB the LSH path is the scale path: shingle explode → per-doc
signature agg (one shuffle on doc id) → band-bucket self-join (shuffle on
band value, bounded fanout per bucket) → verify only candidate pairs.
Brute-force pairwise (dedup_ngram_jaccard / embedding cross join) is kept
as the small-N oracle-able baseline.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a)) / F.sqrt(dot(b, b))


@pandas_udf(T.DoubleType())
def cosine_np(a: pd.Series, b: pd.Series) -> pd.Series:
    """Numpy scale path for cosine similarity: one einsum per Arrow batch
    over the stacked (rows × dim) matrices — no per-element lambda
    interpretation. The HOF form (``cosine``) stays the oracle-exact
    baseline: its left-fold accumulation matches DuckDB bit-for-bit, while
    numpy's pairwise summation can differ in the last ulp; at 10^9 vectors
    that trade is the right one (the HOF lambdas evaluate interpreted —
    see BENCH/BASELINE.md)."""
    import numpy as np

    A = np.stack(a.values).astype(np.float64)
    B = np.stack(b.values).astype(np.float64)
    num = np.einsum("ij,ij->i", A, B)
    return pd.Series(
        num
        / np.sqrt(np.einsum("ij,ij->i", A, A))
        / np.sqrt(np.einsum("ij,ij->i", B, B))
    )


def matmul_bucket_scores(
    cand: DataFrame,
    queries_by_bucket: dict[int, tuple],
    emb_col: str = "ce",
    id_col: str = "neighbor_id",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Amortized-transfer ANN scoring: mapInPandas over the candidate side
    only. Each candidate vector crosses the Python boundary ONCE and is
    scored against every query probing its bucket with a single matmul —
    versus a per-pair pandas UDF, where Arrow ships 2×dim floats for every
    (query, candidate) pair (measured 0.7x vs even the interpreted HOF
    form; bench/ann_delta.py). Queries are the small side by definition
    (driver-collected, in-closure — the same smallness assumption as the
    broadcast join in the HOF plan).

    ``queries_by_bucket``: bucket -> (qids int64[m], Q float64[m,dim],
    qnorm float64[m]); a bucket missing from the dict produces no scores.
    """
    import numpy as np

    schema = f"query_id long, {id_col} long, cosine_sim double"

    def score(batches):
        for pdf in batches:
            outs = []
            for b, grp in pdf.groupby(bucket_col):
                qb = queries_by_bucket.get(int(b))
                if qb is None or not len(grp):
                    continue
                qids, Q, qnorm = qb
                C = np.stack(grp[emb_col].values).astype(np.float64)
                cnorm = np.sqrt(np.einsum("ij,ij->i", C, C))
                S = (Q @ C.T) / qnorm[:, None] / cnorm[None, :]
                m, n = S.shape
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(qids, n),
                            id_col: np.tile(grp[id_col].values, m),
                            "cosine_sim": S.ravel(),
                        }
                    )
                )
            yield (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype="int64"),
                        id_col: pd.Series([], dtype="int64"),
                        "cosine_sim": pd.Series([], dtype="float64"),
                    }
                )
            )

    return cand.mapInPandas(score, schema)


def bucket_pair_scores(
    b: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_col: str = "bucket",
    chunk: int = 1024,
) -> DataFrame:
    """All-pairs cosine WITHIN each LSH cell via per-cell chunked matmul —
    the near-dup analogue of matmul_bucket_scores. applyInPandas groups by
    cell, stacks the cell's vectors ONCE, and scores every within-cell pair
    with numpy matmuls in ``chunk``-row slabs (memory O(chunk × cell), not
    O(cell²)); only pairs with cosine >= tau are emitted, as
    (id_a, id_b, cosine_sim) with id_a < id_b.

    Per vector cost: one Arrow crossing + one stacked row — versus the
    per-pair forms (HOF ``cosine`` or ``cosine_np``) where each vector is
    re-shipped/re-evaluated once per candidate pair, i.e. ~cell-population
    times. This is the verify scorer to run on the full-corpus LSH path
    (q_embedding_neardup_lsh_np); the HOF form stays the DuckDB-oracle
    twin because its left-fold accumulation is bit-identical to SQL while
    numpy's pairwise summation can differ in the last ulp.
    """
    import numpy as np

    schema = "id_a long, id_b long, cosine_sim double"

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cosine_sim": pd.Series([], dtype="float64"),
            }
        )
        if n < 2:
            return empty
        ids = pdf[id_col].values.astype(np.int64)
        V = np.stack(pdf[emb_col].values).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", V, V))
        outs = []
        for i0 in range(0, n, chunk):
            i1 = min(i0 + chunk, n)
            S = (V[i0:i1] @ V.T) / norms[i0:i1, None] / norms[None, :]
            ii, jj = np.nonzero(S >= tau)
            ii = ii + i0
            keep = jj > ii  # upper triangle: each unordered pair once
            ii, jj = ii[keep], jj[keep]
            if len(ii):
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": np.minimum(ids[ii], ids[jj]),
                            "id_b": np.maximum(ids[ii], ids[jj]),
                            "cosine_sim": S[ii - i0, jj],
                        }
                    )
                )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return b.groupBy(bucket_col).applyInPandas(score, schema)


def greedy_cell_dedup(
    b: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Semantic dedup (SemDeDup-style, Abbas et al. 2023): within each
    coarse cell, a GREEDY keep/drop sweep in ascending id order — a vector
    is dropped iff its cosine to some already-KEPT same-cell vector is
    >= tau, and ``dup_of`` records the smallest such kept id. Unlike the
    pair emitters (bucket_pair_scores), the survivor set is
    comparison-against-kept-only: a chain a~b, b~c, a!~c keeps BOTH a and
    c (b is dropped against a; c is compared only to the kept a), which is
    the published SemDeDup policy and NOT derivable from the pair set by
    an anti-join.

    Per cell: one Arrow crossing per vector (applyInPandas stacks the cell
    once), then a sequential sweep whose step i is one numpy matvec
    against the kept slab — O(cell · kept · dim) flops, memory O(cell ·
    dim). Cells are independent (embarrassingly parallel across
    executors); the sequential part is bounded by cell population, never
    corpus size. At 10^9 vectors the cells come from a trained coarse
    quantizer (the kmeans machinery of q_ann_kmeans_topk, or the sign-LSH
    grid of ivf_bucket with more planes) sized so cells fit an executor —
    the same cell-cap knob every IVF index has.

    Arithmetic is the proven oracle-exact shape: float64 dot first, then
    the two norm divisions in sequence (matches the DuckDB oracle's
    ``dot / sqrt(dot) / sqrt(dot)`` fold; see bucket_pair_scores on the
    last-ulp caveat). Zero-norm vectors are "never similar → always
    kept" on BOTH engines, through different mechanics: numpy yields NaN
    cosines and ``NaN >= tau`` is False; DuckDB yields NULL for 0.0/0.0
    and ``list_position(…, TRUE)`` skips NULL elements (pinned by
    tests/test_ml_ops.py::test_semantic_dedup_zero_norm_alignment).
    The oracle's norm lookup under duplicate kept vectors is likewise
    safe because identical vectors have identical norms (and a duplicate
    of a kept vector is dropped at cosine 1 anyway).

    Reference behavior analogue: the reference dedups synced rows only by
    exact key before load (`/root/reference/app/db.py` upsert); semantic
    near-dup pruning is the training-data-scale extension SURVEY.md §2
    groups with the dedup family.
    """
    schema = f"{id_col} long, {bucket_col} int, kept boolean, dup_of long"

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        return _sweep_frame(pdf, None, tau, id_col, emb_col, bucket_col)

    return b.groupBy(bucket_col).applyInPandas(prune, schema)


def _sweep_frame(
    pdf: pd.DataFrame,
    seed_pdf: pd.DataFrame | None,
    tau: float,
    id_col: str,
    emb_col: str,
    bucket_col: str,
) -> pd.DataFrame:
    """Shared greedy core for the batch and incremental sweeps: process
    ``pdf``'s rows ascending by id against a kept slab seeded from
    ``seed_pdf`` (prior survivors, all ids below the batch — asserted),
    appending new survivors as it goes. dot first, then the two norm
    divisions — same order as the SQL oracle; kept slab stays ascending
    by id so the first hit IS the smallest kept id over threshold (the
    oracle's list_position)."""
    import numpy as np

    pdf = pdf.sort_values(id_col)
    ids = pdf[id_col].values.astype(np.int64)
    bk = pdf[bucket_col].values
    V = np.stack(pdf[emb_col].values).astype(np.float64)
    if seed_pdf is not None and len(seed_pdf):
        seed_pdf = seed_pdf.sort_values(id_col)
        seed_ids = seed_pdf[id_col].values.astype(np.int64)
        if len(ids) and ids[0] <= seed_ids[-1]:
            raise ValueError(
                "semantic ingest contract violated: batch ids must all be "
                f"greater than every indexed id (batch min {ids[0]} <= "
                f"index max {seed_ids[-1]})"
            )
        SV = np.stack(seed_pdf[emb_col].values).astype(np.float64)
        M = np.vstack([SV, V])
        all_ids = np.concatenate([seed_ids, ids])
        n_seed = len(seed_ids)
    else:
        M, all_ids, n_seed = V, ids, 0
    nrm = np.sqrt(np.einsum("ij,ij->i", M, M))
    n = len(ids)
    kept = np.zeros(n, dtype=bool)
    # int64 end-to-end: routing ids through float64 would silently corrupt
    # ids above 2^53 (snowflake-style ids) — dup_of is valid iff NOT kept
    dup_of = np.zeros(n, dtype=np.int64)
    kept_idx: list[int] = list(range(n_seed))
    for i in range(n):
        j = n_seed + i
        if kept_idx:
            sims = (M[kept_idx] @ M[j]) / nrm[kept_idx] / nrm[j]
            hit = np.nonzero(sims >= tau)[0]
        else:
            hit = ()
        if len(hit):
            dup_of[i] = all_ids[kept_idx[hit[0]]]
        else:
            kept[i] = True
            kept_idx.append(j)
    return pd.DataFrame(
        {
            id_col: ids,
            bucket_col: bk,
            "kept": kept,
            "dup_of": pd.array(
                [None if k else int(d) for k, d in zip(kept, dup_of)], dtype="Int64"
            ),
        }
    )


def greedy_cell_dedup_incremental(
    batch: DataFrame,
    kept_index: DataFrame | None,
    tau: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """One SemDeDup INGEST step: decide the incoming batch against the
    survivor index built from prior batches — the online form of
    greedy_cell_dedup for the engine's epoch-by-epoch CDC arrival.

    Contract: batches arrive as ascending id ranges (every id in batch k
    exceeds every id in batches < k — the binlog's seq order gives this
    for free). Under it the union of per-batch decisions is IDENTICAL to
    the one-shot batch sweep by the prefix property: greedy processes ids
    ascending, so decisions for a prefix never depend on later ids.
    Equivalence is pytest-pinned (tests/test_ml_ops.py) against the
    oracle-anchored batch entry under multiple splits; the contract is
    enforced distributed, per cell, inside the sweep (zero extra
    actions) — a violating batch raises rather than silently diverging
    from batch-mode.

    Plan shape: one cogroup (both sides exchange-partitioned on the cell
    id) feeding FlatMapCoGroupsInPandas; per-batch cost scales with the
    batch and its cells' survivor populations, never the corpus. The
    caller owns the index: new index = old index ∪ (batch ⋉ kept
    decisions); only SURVIVORS are indexed, so the index grows with the
    deduplicated corpus, not the raw stream."""
    schema = f"{id_col} long, {bucket_col} int, kept boolean, dup_of long"

    def sweep(batch_pdf: pd.DataFrame, index_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(batch_pdf):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    bucket_col: pd.Series([], dtype="int32"),
                    "kept": pd.Series([], dtype="bool"),
                    "dup_of": pd.array([], dtype="Int64"),
                }
            )
        return _sweep_frame(batch_pdf, index_pdf, tau, id_col, emb_col, bucket_col)

    if kept_index is None:
        return batch.groupBy(bucket_col).applyInPandas(
            lambda pdf: _sweep_frame(pdf, None, tau, id_col, emb_col, bucket_col),
            schema,
        )
    return (
        batch.groupBy(bucket_col)
        .cogroup(kept_index.select(id_col, emb_col, bucket_col).groupBy(bucket_col))
        .applyInPandas(lambda _k, b_pdf, i_pdf: sweep(b_pdf, i_pdf), schema)
    )


def shingle_rows(docs_df: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc, word-3-gram shingle) rows from a document frame.

    posexplode + lead-window + concat_ws stays inside whole-stage codegen
    (higher-order-function lambdas evaluate interpreted, measured ~5x
    slower); one shuffle on the doc key (uniform), pure map-side before
    it. Shared by the batch dedup queries and the incremental LSH index
    (which re-derives shingles for CANDIDATE docs only instead of storing
    the corpus's shingle sets)."""
    from pyspark.sql import Window

    from .text import tokens

    tr = docs_df.select(doc_col, F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"))
    w = Window.partitionBy(doc_col).orderBy("pos")
    lead1, lead2 = F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
    return (
        tr.select(
            doc_col,
            F.concat_ws(" ", F.col("tok"), lead1, lead2).alias("shingle"),
            lead2.isNotNull().alias("_full"),
        )
        .filter("_full")
        .drop("_full")
        .distinct()
    )


def jaccard_verify(inter: DataFrame, sizes: DataFrame, tau: float) -> DataFrame:
    """(doc_a, doc_b, |∩| as c) + per-doc shingle counts (doc_id, n) →
    verified pairs at jaccard >= tau. ONE definition shared by the brute
    baseline, the batch LSH path, and the incremental index so no caller
    can silently compute a different "jaccard" (|∩| / (|A|+|B|-|∩|),
    all-integer inputs, one double division → engine-identical vs the
    DuckDB oracle)."""
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )


def minhash_signature(sh_df: DataFrame, doc_col: str, shingle_col: str, k: int = 8) -> DataFrame:
    """From exploded distinct (doc, shingle) rows to one row per doc with
    columns h0..h{k-1} (lexicographic-min md5 per permutation)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col(shingle_col)))).alias(f"h{i}")
        for i in range(k)
    ]
    return sh_df.groupBy(doc_col).agg(*aggs)


def lsh_bands(sig_df: DataFrame, doc_col: str, k: int = 8, rows_per_band: int = 2) -> DataFrame:
    """Signature → (doc, band_id, band_val) rows; docs sharing any band
    value are candidate pairs.

    Single-pass: bands come from one explode over an inline array of
    (band_id, band_val) structs — NOT a union of per-band branches, which
    would recompute the signature aggregation once per band."""
    if k % rows_per_band != 0:
        raise ValueError(
            f"k={k} is not divisible by rows_per_band={rows_per_band}: "
            "trailing signature hashes would be silently dropped from "
            "banding, lowering recall below the configured (k, r)"
        )
    n_bands = k // rows_per_band
    structs = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        structs.append(
            F.struct(F.lit(b).alias("band_id"), F.concat(*cols).alias("band_val"))
        )
    return sig_df.select(
        F.col(doc_col), F.explode(F.array(*structs)).alias("_b")
    ).select(doc_col, "_b.band_id", "_b.band_val")


def candidate_pairs(bands_df: DataFrame, doc_col: str) -> DataFrame:
    """Distinct unordered candidate pairs per band bucket, via a bucket
    self-join.

    The self-join STREAMS pairs (a degenerate bucket of m duplicated docs
    yields m^2/2 rows spread over tasks, which AQE's skew-split handles)
    — a groupBy+collect_set pair expansion was measured slightly faster on
    balanced data but materializes a whole bucket's m^2/2 pairs as one
    array value in one row, which breaks on mass-duplicated corpora.
    Callers should persist ``bands_df``'s upstream (signatures/shingles)
    so the two join sides don't recompute it."""
    a = bands_df.select(
        F.col("band_id"), F.col("band_val"), F.col(doc_col).alias("doc_a")
    )
    b = bands_df.select(
        F.col("band_id"), F.col("band_val"), F.col(doc_col).alias("doc_b")
    )
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def plane_signs(plane: int, dim: int) -> list[float]:
    """±1 hyperplane components, derived once at plan-build time from
    ``md5(plane || '|' || (i+1))`` (first hex digit < '8' → +1) — the same
    derivation the DuckDB oracle performs in SQL, so buckets match
    bit-exactly while the executed plan carries only literals."""
    out = []
    for i in range(1, dim + 1):
        h = hashlib.md5(f"{plane}|{i}".encode()).hexdigest()
        out.append(1.0 if h[0] < "8" else -1.0)
    return out


def sign_projection(emb: Column, plane: int, dim: int = 64) -> Column:
    """Signed projection of a vector onto deterministic hyperplane
    ``plane``. The ±1 components are precomputed Python-side (plane_signs)
    and baked in as an array literal: no per-row hashing — at 10^9 vectors
    the previous expression-side md5 cost 4·dim·10^9 row-constant hashes
    Catalyst cannot fold. Left-fold double accumulation matches the
    oracle's ``list_sum(list_transform(...))`` order."""
    signs = F.array(*[F.lit(s) for s in plane_signs(plane, dim)])
    # slice signs to the vector's length so shorter vectors never zip
    # against null padding
    weighted = F.zip_with(
        emb, F.slice(signs, 1, F.size(emb)), lambda x, s: x.cast("double") * s
    )
    proj = F.aggregate(weighted, F.lit(0.0), lambda acc, v: acc + v)
    # A vector LONGER than dim would zip real components against null
    # padding, null the projection, and silently funnel every row into
    # bucket 0 (a near-cartesian candidate join). Make the docstring
    # precondition a hard executor-side error instead.
    return F.when(
        F.assert_true(
            F.size(emb) <= F.lit(dim),
            F.concat(
                F.lit(f"sign_projection: embedding length "),
                F.size(emb).cast("string"),
                F.lit(f" exceeds plane dim {dim}"),
            ),
        ).isNull(),
        proj,
    )


def ivf_bucket(emb: Column, n_planes: int = 4) -> Column:
    """Coarse IVF cell id in [0, 2^n_planes): bit b set iff the plane-b
    signed projection is >= 0. This is random-hyperplane (sign) LSH — the
    coarse quantizer of an IVF index, built from expressions only (no UDF,
    no trained centroids to ship)."""
    bucket = F.lit(0)
    for b in range(n_planes):
        bucket = bucket + F.when(sign_projection(emb, b) >= 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        )
    return bucket


def ivf_probe_buckets(emb: Column, n_planes: int = 4) -> Column:
    """Multi-probe list: the exact cell plus every single-bit-flip neighbor
    cell (Hamming-1 probing), so a query near a hyperplane boundary still
    finds neighbors quantized to the adjacent cell."""
    exact = ivf_bucket(emb, n_planes)
    return F.array(exact, *[exact.bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)])


@pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """Vectorized 64-bit SimHash over whitespace tokens (md5-derived token
    hashes, with multiplicity). Arrow-batched AND numpy-vectorized inside
    the batch: each distinct token in the batch is md5'd once, its 64 sign
    bits come from one ``unpackbits`` over the first 8 digest bytes, and
    the per-document ±1 accumulation is a single ``add.reduceat`` segment
    sum — no 64-iteration Python bit loop per token. Bit b of the result
    is set iff the signed sum over token-hash bit b is > 0 (ties clear),
    folded to signed int64."""
    import numpy as np

    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    tok_lists = [t.split() if isinstance(t, str) else [] for t in texts]
    counts = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
    all_toks = [tok for tl in tok_lists for tok in tl]
    if all_toks:
        uniq, inv = np.unique(np.array(all_toks, dtype=object), return_inverse=True)
        dig = np.frombuffer(
            b"".join(hashlib.md5(u.encode()).digest()[:8] for u in uniq),
            dtype=np.uint8,
        ).reshape(-1, 8)
        # column j of unpackbits is bit (63-j) of the big-endian uint64;
        # reverse so column b == bit b, matching (h >> b) & 1
        signs = (np.unpackbits(dig, axis=1, bitorder="big").astype(np.int32) * 2 - 1)[
            :, ::-1
        ]
        tok_signs = signs[inv]
        nz = counts > 0
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))[nz]
        acc = np.add.reduceat(tok_signs, starts, axis=0)
        pos = acc > 0
        packed = np.packbits(pos[:, ::-1], axis=1, bitorder="big")
        out[nz] = (
            packed.view(">u8").ravel().astype(np.uint64).view(np.int64)
        )
    return pd.Series(out)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two signed-64-bit simhashes via bit_count
    of XOR (JVM built-in)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# kmeans-IVF: trained coarse quantizer (vs ivf_bucket's data-free sign-LSH)
# ---------------------------------------------------------------------------

def kmeans_centroids(X, k: int, iters: int = 10):
    """Deterministic spherical k-means (Lloyd's) over a sample matrix.

    Rows are L2-normalized first, so assignment = argmax dot product =
    cosine k-means. Init is the first ``k`` rows of the (caller-ordered)
    sample — the caller supplies hash-ordered rows, making init a
    deterministic pseudo-random pick. Empty clusters keep their previous
    centroid. Returns (k × dim) float64 with unit rows.
    """
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(k, len(Xn))
    C = Xn[:k].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    C[j] = m / n
    return C


def train_kmeans_ivf(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iters: int = 10,
    sample_n: int = 10_000,
):
    """Train IVF centroids from a BOUNDED deterministic sample: rows are
    ranked by md5('kmeans|' || id) (an order-free pseudo-shuffle,
    identical on any partitioning AND engine-independent — DuckDB derives
    the same sample in the same order, which is what lets the
    ann_kmeans_topk oracle regenerate this exact codebook without Spark)
    and the first ``sample_n`` vectors are collected — O(sample_n × dim)
    driver memory regardless of corpus size, the same train-on-sample
    recipe every production IVF index uses. The returned (k × dim) array
    is closure-shipped to executors (a few KB)."""
    rows = (
        df.select(F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.concat(F.lit("kmeans|"), F.col(id_col).cast("string"))))
        .limit(sample_n)
        .collect()
    )
    return kmeans_centroids([r["v"] for r in rows], k=k, iters=iters)


def kmeans_assign(centroids, emb: Column):
    """Cell id for each vector: argmax cosine vs the trained centroids,
    as a numpy pandas UDF (one matmul per Arrow batch)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf(T.IntegerType())
    def _assign(v: pd.Series) -> pd.Series:
        X = np.stack(v.values).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Xn @ C.T, axis=1).astype(np.int32))

    return _assign(emb)


def kmeans_probe(centroids, emb: Column, n_probe: int = 4):
    """Multi-probe list for a query vector: ids of its ``n_probe`` nearest
    centroids (ordered, deterministic tie-break by centroid id via stable
    argsort on (-score, id))."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    p = min(n_probe, len(C))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _probe(v: pd.Series) -> pd.Series:
        X = np.stack(v.values).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        S = Xn @ C.T
        # stable argsort on -S: equal scores break toward lower centroid id
        order = np.argsort(-S, axis=1, kind="stable")[:, :p].astype(np.int32)
        return pd.Series(list(order))

    return _probe(emb)

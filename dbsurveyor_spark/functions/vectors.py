"""Vector math over array<float> embedding columns — JVM-side, no UDFs.

Dot products / norms / cosine are expressed two ways with identical IEEE
results: Spark higher-order functions (`zip_with` + `aggregate`; interpreted,
fine for metadata-scale frames) and an Arrow-batched numpy kernel for the
pair-scoring hot paths (see `_cosine_kernel`). The DuckDB oracle mirrors the
computation with `list_transform` + `list_reduce` using the SAME left-fold
order, so results are bit-identical IEEE doubles (verified empirically;
`list_dot_product` is NOT used because its accumulation order is not
contractually the same).

Cosine values exposed in query outputs are rounded to 9 decimals to absorb
any residual representation differences at display boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

COS_ROUND = 9


def as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (portable guard)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_rounded(a: Column, b: Column) -> Column:
    return F.round(cosine(a, b), COS_ROUND)


# ---------------------------------------------- Arrow-vectorized hot kernel
#
# Both JVM-side expressions of this fold lose at dim=64 (measured, sf0.1):
# - higher-order `aggregate`/`zip_with` lambdas run on the INTERPRETED
#   expression path — the cosine alone cost ~10× the rest of a 100k-row
#   broadcast-join pass (3.3 s vs 0.3 s);
# - unrolling into 3·dim element_at terms blows the whole-stage-codegen
#   consume method past janino's method limits (InternalCompilerException,
#   multi-second compile attempts, then interpreted fallback anyway).
# The Arrow-batched pandas UDF below is the fast path: numpy sweeps one
# dimension at a time, so each row sees the IDENTICAL left fold
# ((0.0 + a1·b1) + a2·b2) + … as :func:`dot`. IEEE-754 double ops are
# deterministic for a fixed operation sequence, so results are
# bit-identical to the HOF version and to the DuckDB list_reduce mirror.
# Rounding stays OUTSIDE the UDF (Spark F.round ≡ DuckDB round here).
#
# Preconditions (hold for every call site): non-null arrays, equal length
# within a batch. Inputs must already be array<double>.


@F.pandas_udf(DoubleType())
def _cosine_kernel(a, b):  # pragma: no cover — runs on executors
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy()).astype(np.float64, copy=False)
    B = np.stack(b.to_numpy()).astype(np.float64, copy=False)
    n = A.shape[0]
    d = np.zeros(n)
    na = np.zeros(n)
    nb = np.zeros(n)
    for i in range(A.shape[1]):
        ai = A[:, i]
        bi = B[:, i]
        d += ai * bi
        na += ai * ai
        nb += bi * bi
    na = np.sqrt(na)
    nb = np.sqrt(nb)
    ok = (na > 0) & (nb > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(ok, d / (na * nb), 0.0)
    return pd.Series(out)


def cosine_rounded_arrow(a: Column, b: Column) -> Column:
    """Arrow-kernel cosine, rounded like :func:`cosine_rounded` — same
    values, ~10× cheaper per pair. Use in pair-scoring hot paths."""
    return F.round(_cosine_kernel(a, b), COS_ROUND)


# Filter-pushdown duplication guard: when a query FILTERS on the column a
# Python UDF computes, Catalyst pushes the filter below the defining
# projection and duplicates the UDF — two ArrowEvalPython nodes, every
# surviving pair paying the kernel twice (observed in
# dedup_embedding_cosine / corpus_decontamination_semantic plans). Marking
# the kernel non-deterministic at THOSE call sites forbids the copy, so
# the plan evaluates it once and filters above (the standard guard for
# expensive UDFs; the function itself is pure, so results are unchanged).
# Kept as a separate entry point: blanket non-determinism would also block
# legitimate pushdown of OTHER filters in the scoring queries.
_cosine_kernel_once = _cosine_kernel.asNondeterministic()


def cosine_rounded_arrow_once(a: Column, b: Column) -> Column:
    """:func:`cosine_rounded_arrow` for call sites with a threshold filter
    directly above the score projection — single evaluation guaranteed."""
    return F.round(_cosine_kernel_once(a, b), COS_ROUND)


# Schema of cell_topk_mapper output (mapInPandas contract).
CELL_TOPK_SCHEMA = "vec_id bigint, cell_id bigint, rn int"


def cell_topk_mapper(cent_rows: list, nprobe: int):
    """mapInPandas factory: score each (vec_id, embedding) batch against the
    closure-captured centroid model and emit every vector's `nprobe` nearest
    cells — (vec_id, cell_id, rn), rn 1-based by raw cosine DESC, cell_id ASC.

    This replaces a corpus × centroids cross join + per-vector window: the
    corpus streams through ONCE (Arrow transfer = the corpus itself, not
    |corpus|·k score rows), nothing wide goes through a shuffle, and the
    top-nprobe selection happens batch-locally. The model (k×dim doubles)
    rides in the task closure — metadata-scale, like a broadcast hint.

    Parity: scores accumulate one dimension at a time across the batch, so
    every (vector, cell) pair sees the exact left fold of :func:`dot`;
    ranking uses RAW cosine (bit-identical across engines — no rounding
    boundary to disagree on) with ties broken by ascending cell_id, which
    the argsort below reproduces via stable sort over cell_id-sorted
    centroids. ``cent_rows`` must be sorted by cell_id.
    """
    cell_ids = [int(r[0]) for r in cent_rows]
    cvecs = [[float(x) for x in r[1]] for r in cent_rows]

    def mapper(batches):  # pragma: no cover — runs on executors
        import numpy as np
        import pandas as pd

        cids = np.asarray(cell_ids, dtype=np.int64)
        C = np.asarray(cvecs, dtype=np.float64)  # k × dim
        k, dim = C.shape
        cn = np.zeros(k)
        for i in range(dim):
            cn += C[:, i] * C[:, i]
        cn = np.sqrt(cn)
        take = min(nprobe, k)
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64, copy=False
            )
            acc = np.zeros((m, k))
            na = np.zeros(m)
            for i in range(dim):
                ai = A[:, i]
                na += ai * ai
                acc += ai[:, None] * C[None, :, i]
            na = np.sqrt(na)
            ok = (na[:, None] > 0) & (cn[None, :] > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(ok, acc / (na[:, None] * cn[None, :]), 0.0)
            order = np.argsort(-cos, axis=1, kind="stable")[:, :take]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), take),
                    "cell_id": cids[order].ravel(),
                    "rn": np.tile(np.arange(1, take + 1, dtype=np.int32), m),
                }
            )

    return mapper


# Schema of centroid_partial_mapper output: one row per (partition, cell)
# holding that partition's member count and exact per-dimension sums in
# 1e-9 units (the DECIMAL(30,9) lattice). int64 is safe partition-locally:
# |unit| ≤ 1e9·|v| and partition row counts are bounded by
# spark.sql.files.maxPartitionBytes, keeping sums ≪ 2^63.
CENTROID_PARTIAL_SCHEMA = "cell_id bigint, cnt bigint, sums array<bigint>"


def centroid_partial_mapper(cent_rows: list):
    """mapInPandas factory for one Lloyd step's map side: fuse nearest-cell
    assignment (bit-identical scoring to :func:`cell_topk_mapper` at
    nprobe=1) with per-partition partial mean state — emitting only
    (cell_id, cnt, sums) per partition instead of corpus×dim rows through a
    shuffle. The driver merges the ≤ partitions×k partial rows exactly.

    Exact-decimal parity: each coordinate is quantized to the
    DECIMAL(30,9) lattice exactly as Spark's double→decimal cast (shortest
    decimal repr, then HALF_UP — ties away from zero) and DuckDB's
    equivalent cast do. The vectorized path floor(v·1e9 + 0.5) is exact
    whenever the scaled value is ≥1e-4 units away from a rounding
    boundary; the rare boundary-zone values replay the cast via
    Decimal(repr(v)) so no float-product error can flip a unit. Integer
    unit sums are order-independent, so the result is bit-identical to a
    single-pass decimal aggregate regardless of partitioning.
    """
    cell_ids = [int(r[0]) for r in cent_rows]
    cvecs = [[float(x) for x in r[1]] for r in cent_rows]

    def mapper(batches):  # pragma: no cover — runs on executors
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        cids = np.asarray(cell_ids, dtype=np.int64)
        C = np.asarray(cvecs, dtype=np.float64)  # k × dim
        k, dim = C.shape
        cn = np.zeros(k)
        for i in range(dim):
            cn += C[:, i] * C[:, i]
        cn = np.sqrt(cn)
        S = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        quant = Decimal(1).scaleb(-9)
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64, copy=False
            )
            # -- assignment: the exact fold/rank of cell_topk_mapper(…, 1)
            acc = np.zeros((m, k))
            na = np.zeros(m)
            for i in range(dim):
                ai = A[:, i]
                na += ai * ai
                acc += ai[:, None] * C[None, :, i]
            na = np.sqrt(na)
            ok = (na[:, None] > 0) & (cn[None, :] > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(ok, acc / (na[:, None] * cn[None, :]), 0.0)
            best = np.argsort(-cos, axis=1, kind="stable")[:, 0]
            # -- exact DECIMAL(30,9) units
            s = A * 1e9
            u = np.floor(s + 0.5)  # nearest away from boundaries (any sign)
            risky = np.abs(s + 0.5 - np.rint(s + 0.5)) < 1e-4
            if risky.any():
                for ri, ci in zip(*np.nonzero(risky)):
                    u[ri, ci] = int(
                        Decimal(repr(float(A[ri, ci])))
                        .quantize(quant, rounding=ROUND_HALF_UP)
                        .scaleb(9)
                    )
            np.add.at(S, best, u.astype(np.int64))
            counts += np.bincount(best, minlength=k)
        live = np.nonzero(counts)[0]
        if live.size:
            yield pd.DataFrame(
                {
                    "cell_id": cids[live],
                    "cnt": counts[live],
                    "sums": [S[i].tolist() for i in live],
                }
            )

    return mapper


def merge_centroid_partials(rows: list) -> list:
    """Exact driver-side reduce of :func:`centroid_partial_mapper` output:
    [(cell_id, mean_vector)] sorted by cell_id, empty cells absent. Means
    replay cast(decimal_sum AS double)/count — Fraction→float is correctly
    rounded, so the double equals what Spark/DuckDB derive from the same
    decimal sum."""
    from fractions import Fraction

    totals: dict[int, tuple[int, list[int]]] = {}
    for r in rows:
        cid = int(r["cell_id"])
        cnt, sums = totals.get(cid, (0, None))
        add = [int(x) for x in r["sums"]]
        if sums is None:
            totals[cid] = (cnt + int(r["cnt"]), add)
        else:
            totals[cid] = (
                cnt + int(r["cnt"]),
                [a + b for a, b in zip(sums, add)],
            )
    return sorted(
        (
            cid,
            [float(Fraction(t, 10**9)) / cnt for t in sums],
        )
        for cid, (cnt, sums) in totals.items()
    )


# ------------------------------------------------------------- DuckDB mirror


def dot_sql(a: str, b: str) -> str:
    """DuckDB fragment: same left-fold order as :func:`dot`."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), "
        f"p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )


def dot_self_sql(a: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(CAST({a} AS DOUBLE[]), x -> x * x)), (acc, v) -> acc + v)"
    )


def cosine_sql(a: str, b: str) -> str:
    d = dot_sql(a, b)
    na = f"sqrt({dot_self_sql(a)})"
    nb = f"sqrt({dot_self_sql(b)})"
    return (
        f"CASE WHEN {na} > 0 AND {nb} > 0 THEN ({d}) / (({na}) * ({nb})) "
        f"ELSE 0.0 END"
    )


def cosine_rounded_sql(a: str, b: str) -> str:
    return f"round({cosine_sql(a, b)}, {COS_ROUND})"


# ------------------------------------------------- product quantization (PQ)

# Schema of pq_encode_mapper output: the PQ code word per vector — m small
# ints (the 100 TB trick: a 64-dim float64 vector compresses 64× to m bytes
# of codebook indices; the posting list ships codes, never vectors).
PQ_ENCODE_SCHEMA = "vec_id bigint, codes array<int>"

# pq_encode_mapper output in residual (IVFADC) mode: the coarse cell rides
# along with the code word — the posting-list entry of an IVFPQ index.
PQ_RESID_ENCODE_SCHEMA = "vec_id bigint, cell_id bigint, codes array<int>"


def _coarse_model(cent_rows: list):
    """(cell_ids, C, cell_norms) numpy model from centroid rows — executor
    helper shared by the residual-mode mappers."""
    import numpy as np

    cids = np.asarray([int(r[0]) for r in cent_rows], dtype=np.int64)
    C = np.asarray(
        [[float(x) for x in r[1]] for r in cent_rows], dtype=np.float64
    )
    cn = np.zeros(C.shape[0])
    for i in range(C.shape[1]):
        cn += C[:, i] * C[:, i]
    return cids, C, np.sqrt(cn)


def _residualize(A, cids, C, cn):  # pragma: no cover — runs on executors
    """(residuals, assigned_cell_ids): assign each row of ``A`` to its
    nearest coarse cell (the exact fold/tie rule of :func:`cell_topk_mapper`
    at nprobe=1) and subtract that centroid. float64 subtraction is exact
    and order-free, so residuals are bit-identical to the SQL mirror's
    `embedding[i] - c_emb[i]`."""
    import numpy as np

    m, dim = A.shape
    k = C.shape[0]
    acc = np.zeros((m, k))
    na = np.zeros(m)
    for i in range(dim):
        ai = A[:, i]
        na += ai * ai
        acc += ai[:, None] * C[None, :, i]
    na = np.sqrt(na)
    ok = (na[:, None] > 0) & (cn[None, :] > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(ok, acc / (na[:, None] * cn[None, :]), 0.0)
    best = np.argsort(-cos, axis=1, kind="stable")[:, 0]
    return A - C[best], cids[best]


def pq_encode_mapper(codebooks: list, cent_rows: list | None = None):
    """mapInPandas factory: PQ-encode each (vec_id, embedding) batch — for
    every subspace s, the id of the nearest codebook entry (cosine over the
    subvector, the exact scoring/tie rule of :func:`cell_topk_mapper` at
    nprobe=1). ``codebooks`` is a list over subspaces of [(code_id,
    subvector)] sorted by code_id; total model size m×k×dsub doubles —
    metadata riding in the task closure.

    One streaming corpus pass encodes all m subspaces (no per-subspace
    rescan); Arrow transfer out is |corpus| rows of m ints.

    With ``cent_rows`` (IVFADC mode) each batch is first assigned to its
    nearest coarse cell and RESIDUALIZED against that centroid — the codes
    then quantize x − c(x), and rows carry the coarse cell
    (:data:`PQ_RESID_ENCODE_SCHEMA`), i.e. the IVFPQ posting-list entry.
    """
    subs = []
    for cb in codebooks:
        ids = [int(r[0]) for r in cb]
        vecs = [[float(x) for x in r[1]] for r in cb]
        subs.append((ids, vecs))
    coarse = (
        [(int(r[0]), [float(x) for x in r[1]]) for r in cent_rows]
        if cent_rows is not None
        else None
    )

    def mapper(batches):  # pragma: no cover — runs on executors
        import numpy as np
        import pandas as pd

        models = []
        for ids, vecs in subs:
            C = np.asarray(vecs, dtype=np.float64)  # k × dsub
            cn = np.zeros(C.shape[0])
            for i in range(C.shape[1]):
                cn += C[:, i] * C[:, i]
            models.append((np.asarray(ids, dtype=np.int64), C, np.sqrt(cn)))
        cmodel = _coarse_model(coarse) if coarse is not None else None
        dsub = models[0][1].shape[1]
        for pdf in batches:
            mrows = len(pdf)
            if mrows == 0:
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64, copy=False
            )
            cells = None
            if cmodel is not None:
                A, cells = _residualize(A, *cmodel)
            out = np.empty((mrows, len(models)), dtype=np.int32)
            for s, (ids, C, cn) in enumerate(models):
                Asub = A[:, s * dsub : (s + 1) * dsub]
                k = C.shape[0]
                acc = np.zeros((mrows, k))
                na = np.zeros(mrows)
                for i in range(dsub):
                    ai = Asub[:, i]
                    na += ai * ai
                    acc += ai[:, None] * C[None, :, i]
                na = np.sqrt(na)
                ok = (na[:, None] > 0) & (cn[None, :] > 0)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(ok, acc / (na[:, None] * cn[None, :]), 0.0)
                best = np.argsort(-cos, axis=1, kind="stable")[:, 0]
                out[:, s] = ids[best].astype(np.int32)
            data = {"vec_id": pdf["vec_id"].to_numpy()}
            if cells is not None:
                data["cell_id"] = cells
            data["codes"] = [row.tolist() for row in out]
            yield pd.DataFrame(data)

    return mapper


PQ_ADC_SCHEMA = "query_id bigint, neighbor_id bigint, score double"


def pq_adc_mapper(tables: list, query_ids: list, k: int):
    """mapInPandas factory for the ADC (asymmetric distance computation)
    scan: stream the PQ-coded corpus once and score every vector against
    every probe by LOOKUP — score(q, x) = Σ_s T[q][s][code_s(x)], where
    the distance tables T (probes × m × codes inner products, built
    driver-side with the exact :func:`dot` fold) ride in the closure.

    Per batch only the top-``k`` candidates per probe survive (raw-score
    ranking, ties by ascending neighbor id — bit-stable across engines, so
    the batch-local cut keeps exactly the rows the global rank keeps).
    Emitted volume is ≤ batches×probes×k slim rows; the corpus itself —
    and its original vectors — never shuffle. Self-matches are dropped.
    """
    qids = [int(q) for q in query_ids]
    tabs = [[list(map(float, sub)) for sub in t] for t in tables]

    def mapper(batches):  # pragma: no cover — runs on executors
        import numpy as np
        import pandas as pd

        T = np.asarray(tabs, dtype=np.float64)  # probes × m × codes
        qarr = np.asarray(qids, dtype=np.int64)
        nq, m, _ = T.shape
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            vids = pdf["vec_id"].to_numpy().astype(np.int64)
            # scores[q, row]: left-assoc sum over subspaces s = 0..m-1,
            # mirroring the SQL's literal t1 + t2 + … + tm
            scores = T[:, 0, :][:, codes[:, 0]].copy()
            for s in range(1, m):
                scores += T[:, s, :][:, codes[:, s]]
            take = min(k, n)
            qcol, ncol, scol = [], [], []
            for qi in range(nq):
                sc = scores[qi].copy()
                mask = vids == qarr[qi]
                sc[mask] = -np.inf
                order = np.lexsort((vids, -sc))[:take]
                order = order[~mask[order]]
                qcol.append(np.full(len(order), qarr[qi], dtype=np.int64))
                ncol.append(vids[order])
                scol.append(sc[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qcol),
                    "neighbor_id": np.concatenate(ncol),
                    "score": np.concatenate(scol),
                }
            )

    return mapper


# ------------------------------------------- scalar quantization (SQ8)

# sq_adc_mapper output — same slim candidate shape as the PQ scan.
SQ_ADC_SCHEMA = "query_id bigint, neighbor_id bigint, score double"


def sq_adc_mapper(
    mins: list, deltas: list, queries: list, query_ids: list, k: int
):
    """mapInPandas factory for the SQ8 (8-bit scalar quantization) scan —
    Faiss IndexScalarQuantizer's search: each dimension quantizes
    independently onto a uniform 256-level mid-rise grid over the trained
    per-dim [min, max] range (code = clamp(⌊(x−min)/Δ·256⌋, 0, 255),
    decode x̂ = min + (code+0.5)·Δ/256), and the score is the approximate
    inner product ⟨q, x̂⟩. Unlike PQ there is no codebook argmin — encode
    is pure arithmetic — so encode and scan FUSE into one streaming pass
    (a stored deployment splits this same kernel at the codes array:
    4 B/float → 1 B/dim, an 8× memory cut with ≤ Δ/512 per-dim error).

    Parity: every float op is elementwise IEEE (same scalar expression
    the DuckDB oracle evaluates per dim), and scores accumulate one
    dimension at a time — the literal left fold of the oracle's
    list_reduce. Batch-local top-k on raw scores (ties by ascending
    neighbor id) keeps exactly the rows the global rank keeps;
    self-matches are dropped.
    """
    mn = [float(v) for v in mins]
    dl = [float(v) for v in deltas]
    qs = [[float(x) for x in q] for q in queries]
    qids = [int(q) for q in query_ids]

    def mapper(batches):  # pragma: no cover — runs on executors
        import numpy as np
        import pandas as pd

        mins_a = np.asarray(mn, dtype=np.float64)
        deltas_a = np.asarray(dl, dtype=np.float64)
        safe = np.where(deltas_a > 0, deltas_a, 1.0)
        Q = np.asarray(qs, dtype=np.float64)  # nq × dim
        qarr = np.asarray(qids, dtype=np.int64)
        nq, dim = Q.shape
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64, copy=False
            )
            vids = pdf["vec_id"].to_numpy().astype(np.int64)
            scores = np.zeros((nq, n))
            for i in range(dim):
                if deltas_a[i] > 0:
                    code = np.floor((X[:, i] - mins_a[i]) / safe[i] * 256.0)
                    code = np.minimum(255.0, np.maximum(0.0, code))
                else:
                    code = np.zeros(n)
                xhat = mins_a[i] + (code + 0.5) * deltas_a[i] / 256.0
                scores += np.outer(Q[:, i], xhat)
            take = min(k, n)
            qcol, ncol, scol = [], [], []
            for qi in range(nq):
                sc = scores[qi].copy()
                mask = vids == qarr[qi]
                sc[mask] = -np.inf
                order = np.lexsort((vids, -sc))[:take]
                order = order[~mask[order]]
                qcol.append(np.full(len(order), qarr[qi], dtype=np.int64))
                ncol.append(vids[order])
                scol.append(sc[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qcol),
                    "neighbor_id": np.concatenate(ncol),
                    "score": np.concatenate(scol),
                }
            )

    return mapper


def ivfsq_adc_mapper(
    cent_rows: list,
    rmins: list,
    rdeltas: list,
    queries: list,
    query_ids: list,
    probe_cells: list,
    cell_bias: list,
    k: int,
):
    """mapInPandas factory for the IVF-SQ8 scan (Faiss IndexIVFScalar-
    Quantizer): stream the (vec_id, cell_id, embedding) assignment frame
    once; each row residualizes against its cell centroid (r = x − c(x)),
    SQ8-encodes/decodes the residual on the GLOBAL per-dim residual grid
    (arithmetic, fused — no codebook argmin, exactly like
    :func:`sq_adc_mapper`), and each probe scores ONLY rows in its probed
    cells by score = ⟨q, c(x)⟩ + ⟨q, r̂⟩ (inner-product linearity, as in
    IVFADC). Score accumulation is bias-seeded then one dimension at a
    time — the literal fold of the oracle's bias-prepended list_reduce.
    """
    cids = [int(r[0]) for r in cent_rows]
    cvec_list = [[float(x) for x in r[1]] for r in cent_rows]
    mn_l = [float(v) for v in rmins]
    dl_l = [float(v) for v in rdeltas]
    qs = [[float(x) for x in q] for q in queries]
    qids = [int(q) for q in query_ids]
    pcells = [[int(c) for c in cs] for cs in probe_cells]
    pbias = [[float(b) for b in bs] for bs in cell_bias]

    def mapper(batches):  # pragma: no cover — runs on executors
        import numpy as np
        import pandas as pd

        cmat = np.asarray(cvec_list, dtype=np.float64)
        cpos = {c: i for i, c in enumerate(cids)}
        mins_a = np.asarray(mn_l, dtype=np.float64)
        deltas_a = np.asarray(dl_l, dtype=np.float64)
        safe = np.where(deltas_a > 0, deltas_a, 1.0)
        Q = np.asarray(qs, dtype=np.float64)
        qarr = np.asarray(qids, dtype=np.int64)
        nq, dim = Q.shape
        bias_maps = [dict(zip(pcells[i], pbias[i])) for i in range(nq)]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64, copy=False
            )
            vids = pdf["vec_id"].to_numpy().astype(np.int64)
            cells = pdf["cell_id"].to_numpy().astype(np.int64)
            rowpos = np.asarray([cpos[int(c)] for c in cells], dtype=np.int64)
            R = X - cmat[rowpos]
            Rhat = np.empty_like(R)
            for i in range(dim):
                if deltas_a[i] > 0:
                    code = np.floor((R[:, i] - mins_a[i]) / safe[i] * 256.0)
                    code = np.minimum(255.0, np.maximum(0.0, code))
                else:
                    code = np.zeros(n)
                Rhat[:, i] = mins_a[i] + (code + 0.5) * deltas_a[i] / 256.0
            take = min(k, n)
            qcol, ncol, scol = [], [], []
            for qi in range(nq):
                bmap = bias_maps[qi]
                mask = np.isin(cells, pcells[qi]) & (vids != qarr[qi])
                if not mask.any():
                    continue
                idx = np.nonzero(mask)[0]
                sc = np.asarray(
                    [bmap[int(c)] for c in cells[idx]], dtype=np.float64
                )
                for i in range(dim):
                    sc = sc + Q[qi, i] * Rhat[idx, i]
                order = np.lexsort((vids[idx], -sc))[:take]
                sel = idx[order]
                qcol.append(np.full(len(sel), qarr[qi], dtype=np.int64))
                ncol.append(vids[sel])
                scol.append(sc[order])
            if qcol:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(qcol),
                        "neighbor_id": np.concatenate(ncol),
                        "score": np.concatenate(scol),
                    }
                )

    return mapper


def ivfpq_adc_mapper(
    tables: list,
    query_ids: list,
    probe_cells: list,
    cell_bias: list,
    k: int,
):
    """mapInPandas factory for the IVFADC scan (Jégou et al. IVFPQ): stream
    the (vec_id, cell_id, codes) posting list once; each probe scores ONLY
    rows in its ``probe_cells`` (the nprobe inverted lists) by
    score = ⟨q, c(x)⟩ + Σ_s T[q][s][code_s(x)] — the coarse term plus the
    residual ADC lookup. Under inner product the residual tables are built
    from q itself (⟨q, c + r⟩ = ⟨q,c⟩ + ⟨q,r⟩), so one table per probe
    serves every probed cell; only the scalar bias varies per cell.

    ``probe_cells``/``cell_bias`` align with ``query_ids``: probe_cells[i]
    is the cell-id list, cell_bias[i] the matching ⟨q, c⟩ list (exact
    driver-side folds). Batch-local top-``k`` cut exactly like
    :func:`pq_adc_mapper`; score addition order is bias + t1 + … + tm,
    matching the SQL's literal left-assoc sum.
    """
    qids = [int(q) for q in query_ids]
    tabs = [[list(map(float, sub)) for sub in t] for t in tables]
    pcells = [[int(c) for c in cs] for cs in probe_cells]
    pbias = [[float(b) for b in bs] for bs in cell_bias]

    def mapper(batches):  # pragma: no cover — runs on executors
        import numpy as np
        import pandas as pd

        T = np.asarray(tabs, dtype=np.float64)  # probes × m × codes
        qarr = np.asarray(qids, dtype=np.int64)
        nq, m, _ = T.shape
        # per-probe dense bias lookup keyed by cell id
        bias_maps = [
            dict(zip(pcells[i], pbias[i])) for i in range(nq)
        ]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            vids = pdf["vec_id"].to_numpy().astype(np.int64)
            cells = pdf["cell_id"].to_numpy().astype(np.int64)
            take = min(k, n)
            qcol, ncol, scol = [], [], []
            for qi in range(nq):
                bmap = bias_maps[qi]
                mask = np.isin(cells, pcells[qi]) & (vids != qarr[qi])
                if not mask.any():
                    continue
                idx = np.nonzero(mask)[0]
                # bias first, then t1..tm left-assoc (SQL parity)
                sc = np.asarray(
                    [bmap[int(c)] for c in cells[idx]], dtype=np.float64
                )
                sc = sc + T[qi, 0, :][codes[idx, 0]]
                for s in range(1, m):
                    sc = sc + T[qi, s, :][codes[idx, s]]
                order = np.lexsort((vids[idx], -sc))[:take]
                sel = idx[order]
                qcol.append(np.full(len(sel), qarr[qi], dtype=np.int64))
                ncol.append(vids[sel])
                scol.append(sc[order])
            if qcol:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(qcol),
                        "neighbor_id": np.concatenate(ncol),
                        "score": np.concatenate(scol),
                    }
                )

    return mapper


PQ_PARTIAL_SCHEMA = "sub int, cell_id bigint, cnt bigint, sums array<bigint>"


def pq_partial_mapper(books: list, cent_rows: list | None = None):
    """mapInPandas factory for one FUSED Lloyd step across all PQ
    subspaces: each batch is decimal-quantized ONCE (the same exact
    DECIMAL(30,9) lattice as :func:`centroid_partial_mapper`), then every
    subspace assigns its subvectors (cosine, identical fold/tie rule) and
    accumulates integer unit sums over its slice. One corpus pass trains
    all m codebooks per iteration instead of m separate passes.

    ``books`` is the current model: list over subspaces of [(code_id,
    subvector)]. Output rows are (sub, cell_id, cnt, sums-of-units);
    driver-side, filter per ``sub`` and reuse
    :func:`merge_centroid_partials` unchanged.

    With ``cent_rows`` (IVFADC mode) batches residualize against the coarse
    quantizer BEFORE quantization/assignment, so the codebooks train on
    x − c(x) — the quantization then applies to residual values, exactly
    as the SQL mirror's decimal cast over its residual relation.
    """
    subs = []
    for cb in books:
        ids = [int(r[0]) for r in cb]
        vecs = [[float(x) for x in r[1]] for r in cb]
        subs.append((ids, vecs))
    coarse = (
        [(int(r[0]), [float(x) for x in r[1]]) for r in cent_rows]
        if cent_rows is not None
        else None
    )

    def mapper(batches):  # pragma: no cover — runs on executors
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        models = []
        for ids, vecs in subs:
            C = np.asarray(vecs, dtype=np.float64)
            cn = np.zeros(C.shape[0])
            for i in range(C.shape[1]):
                cn += C[:, i] * C[:, i]
            models.append((np.asarray(ids, dtype=np.int64), C, np.sqrt(cn)))
        cmodel = _coarse_model(coarse) if coarse is not None else None
        m = len(models)
        dsub = models[0][1].shape[1]
        S = [
            np.zeros((mdl[1].shape[0], dsub), dtype=np.int64) for mdl in models
        ]
        counts = [np.zeros(mdl[1].shape[0], dtype=np.int64) for mdl in models]
        quant = Decimal(1).scaleb(-9)
        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0:
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64, copy=False
            )
            if cmodel is not None:
                A, _ = _residualize(A, *cmodel)
            # -- exact DECIMAL(30,9) units, quantized once for all subspaces
            sc = A * 1e9
            u = np.floor(sc + 0.5)
            risky = np.abs(sc + 0.5 - np.rint(sc + 0.5)) < 1e-4
            if risky.any():
                for ri, ci in zip(*np.nonzero(risky)):
                    u[ri, ci] = int(
                        Decimal(repr(float(A[ri, ci])))
                        .quantize(quant, rounding=ROUND_HALF_UP)
                        .scaleb(9)
                    )
            u = u.astype(np.int64)
            for s, (ids, C, cn) in enumerate(models):
                Asub = A[:, s * dsub : (s + 1) * dsub]
                k = C.shape[0]
                acc = np.zeros((nrows, k))
                na = np.zeros(nrows)
                for i in range(dsub):
                    ai = Asub[:, i]
                    na += ai * ai
                    acc += ai[:, None] * C[None, :, i]
                na = np.sqrt(na)
                ok = (na[:, None] > 0) & (cn[None, :] > 0)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(
                        ok, acc / (na[:, None] * cn[None, :]), 0.0
                    )
                best = np.argsort(-cos, axis=1, kind="stable")[:, 0]
                np.add.at(S[s], best, u[:, s * dsub : (s + 1) * dsub])
                counts[s] += np.bincount(best, minlength=k)
        frames = []
        for s, (ids, _, _) in enumerate(models):
            live = np.nonzero(counts[s])[0]
            if live.size:
                frames.append(
                    pd.DataFrame(
                        {
                            "sub": np.full(live.size, s, dtype=np.int32),
                            "cell_id": ids[live],
                            "cnt": counts[s][live],
                            "sums": [S[s][i].tolist() for i in live],
                        }
                    )
                )
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return mapper

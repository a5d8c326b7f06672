"""Similarity search over embedding columns (array<float>).

Two paths:

- **Brute-force cosine top-k** — map-only linear scan + TakeOrdered(k).
  The correct baseline and often the right answer even at scale when the
  query count is small: it parallelizes perfectly and reads each vector
  once (no index build, no shuffle).
- **IVF (inverted-file) index** — k-means-style coarse quantizer:
  every vector is assigned to its nearest centroid (one broadcast of the
  centroid table + a map-only argmin); queries probe only the nprobe
  nearest centroid partitions.  At 100 TB the partition-pruned probe
  reads ~nprobe/k of the corpus.  Centroids here are seeded
  deterministically from the data (first k by id) and refined with a few
  Lloyd iterations — each iteration is one groupBy(assignment) shuffle of
  *centroid-sized* aggregates, not vectors.

All vector math is JVM-side (zip_with/aggregate); no Python in the scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from garmadon_spark.session import scan_parquet as _scan


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _vec_sql(vec) -> str:
    """A literal double-array as ONE SQL string.  ``repr`` emits the
    shortest round-trip form of each component and Java's parseDouble
    maps that form back to the identical IEEE double, so the parsed
    Literal is bit-equal to what ``F.lit(float(x))`` built — but one
    ``F.expr`` replaces dim py4j round trips (the simhash F.expr
    lesson applied to the vector tier: building a 64-dim literal
    vector as Columns cost ~70 driver round trips per vector, ~1000
    per 16-centroid assignment — measured ~1.8 s of pure driver time
    per build_ivf iteration at dim 64)."""
    return "array(" + ",".join(f"{float(x)!r}D" for x in vec) + ")"


def _lit_vec(vec) -> Column:
    return F.expr(_vec_sql(vec))


def brute_force_topk(
    embs: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only scan + TakeOrdered(k).  Deterministic tie-break on id."""
    q = _lit_vec(query_vec)
    return (
        embs.select(
            id_col,
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# Above this dimensionality, assignment/refinement switch from Catalyst
# expressions (K dot-product aggregates per row; codegen blows up past a
# few hundred dims × centroids) to Arrow-batched NumPy matmul.
PANDAS_ASSIGN_DIM = 128
# expression-path assignment generates len(centroids) dot expressions of
# `dim` terms each; past this many centroids the tree exceeds what
# whole-stage codegen compiles and the Arrow matmul path wins
EXPR_ASSIGN_MAX_CELLS = 64


def assign_cells(df: DataFrame, centroids: list, vec_col: str = "embedding",
                 arrow: bool = False) -> DataFrame:
    """Nearest-centroid assignment (argmax of dot/|c|), dispatching on
    EXPRESSION COST, not dimensionality alone: JVM expressions when the
    generated tree stays codegen-sized (small dim AND few centroids —
    hash-stable for the oracles, which all run ≤64 cells), one
    N×D @ D×K matmul per Arrow batch otherwise.  The centroid bound
    matters as much as the dim bound: with cells ∝ corpus
    (_ivf_cells_for), a 200 k-vector build reaches 800 centroids, and
    an 800-wide array of dot expressions blows past the codegen method
    limit into interpreted execution — the r6 100× sweep measured the
    old dim-only dispatch timing out exactly there.

    ``arrow=True`` forces the matmul path regardless of size: internal
    multi-pass callers (the hierarchical build re-scans the assignment
    for census/sample/fine stages) measured the mid-size expression
    tree ~20× slower per pass than one BLAS matmul."""
    if (not arrow
            and len(centroids[0]) <= PANDAS_ASSIGN_DIM
            and len(centroids) <= EXPR_ASSIGN_MAX_CELLS):
        # the whole K-dot score array as ONE parsed SQL expression —
        # tree-identical to the Column form (same zip_with/aggregate
        # fold, same literal doubles via _vec_sql), but ~K·dim fewer
        # py4j round trips of driver time per call (r14)
        dots = ",".join(
            "aggregate(zip_with(`%s`, %s, (x, y) ->"
            " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " CAST(0.0D AS DOUBLE), (acc, v) -> acc + v) / %rD"
            % (vec_col, _vec_sql(c), _py_norm(c))
            for c in centroids
        )
        scored = df.select(
            "*", F.expr(f"array({dots})").alias("_sims")
        )
        best = F.expr(
            "array_position(_sims, array_max(_sims))"
        ).cast("int") - 1
        return scored.withColumn("ivf_cell", best).drop("_sims")
    return _assign_cells_pandas(df, centroids, vec_col)


def _assign_cells_pandas(df: DataFrame, centroids: list,
                         vec_col: str) -> DataFrame:
    """High-dim path: centroid matrix rides the closure (centroid-sized,
    not data-sized); each Arrow batch does ONE BLAS matmul + argmax."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(C, axis=1)
    norms[norms == 0] = 1.0
    cn_t = np.ascontiguousarray((C / norms[:, None]).T)

    @pandas_udf("int")
    def _cell(v: pd.Series) -> pd.Series:
        m = np.asarray(v.to_list(), dtype=np.float64)
        return pd.Series(np.argmax(m @ cn_t, axis=1).astype("int32"))

    return df.withColumn("ivf_cell", _cell(F.col(vec_col)))


def _cell_sums(assigned: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-cell (vector sum, count) for Lloyd refinement → K rows.

    Small dims: dim aggregate expressions (one shuffle, map-side
    combine).  Large dims: NumPy partial sums per partition via
    mapInPandas, then a K×partitions-sized combine (collect_list +
    elementwise zip_with fold) — never `dim` separate agg expressions.
    """
    if dim <= PANDAS_ASSIGN_DIM:
        # dim sum-aggregates as ONE parsed SQL expression (same
        # GetArrayItem/Cast/Sum tree as the Column form, minus the
        # ~dim py4j round trips of driver time — r14)
        sums = ",".join(
            f"sum(CAST(`{vec_col}`[{i}] AS DOUBLE))" for i in range(dim)
        )
        return assigned.groupBy("ivf_cell").agg(
            F.expr(f"array({sums})").alias("vsum"),
            F.count(F.lit(1)).alias("n"),
        )

    def partials(batches):
        acc: dict[int, list] = {}
        for pdf in batches:
            for cell, g in pdf.groupby("ivf_cell"):
                m = np.asarray(g[vec_col].to_list(), dtype=np.float64)
                cur = acc.setdefault(int(cell), [np.zeros(dim), 0])
                cur[0] += m.sum(axis=0)
                cur[1] += len(g)
        if acc:
            yield pd.DataFrame({
                "ivf_cell": list(acc),
                "vsum": [v[0].tolist() for v in acc.values()],
                "n": [v[1] for v in acc.values()],
            })

    part = assigned.select("ivf_cell", vec_col).mapInPandas(
        partials, "ivf_cell int, vsum array<double>, n long"
    )
    zeros = F.array_repeat(F.lit(0.0), dim)
    return part.groupBy("ivf_cell").agg(
        F.aggregate(
            F.collect_list("vsum"), zeros,
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("vsum"),
        F.sum("n").alias("n"),
    )


def build_ivf(
    embs: DataFrame,
    n_centroids: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = False,
):
    """Build the coarse quantizer + assignments.

    Returns (centroids: list[(cid, vec)], assigned: DataFrame with
    ``ivf_cell`` column).  Centroid seeding = first n_centroids by id
    (deterministic); Lloyd refinement aggregates per-cell means.  Both
    the assignment and the refinement dispatch to an Arrow/NumPy path
    past PANDAS_ASSIGN_DIM dims (see assign_cells/_cell_sums)."""
    seed_rows = (
        embs.orderBy(id_col).limit(n_centroids).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in seed_rows]
    dim = len(centroids[0])

    for _ in range(iterations):
        assigned = assign_cells(embs, centroids, vec_col, arrow=arrow)
        rows = _cell_sums(assigned, vec_col, dim).collect()
        for r in rows:
            if r.n > 0 and r.ivf_cell is not None:
                centroids[r.ivf_cell] = [s / r.n for s in r.vsum]
    assigned = assign_cells(embs, centroids, vec_col, arrow=arrow)
    return centroids, assigned


def _py_norm(v):
    return sum(x * x for x in v) ** 0.5 or 1.0


# --- Hierarchical (two-level) IVF -----------------------------------------
#
# Flat IVF assignment scores every vector against ALL k centroids:
# O(n·k·d).  With cells sized ∝ corpus (k = n/250), that makes the BUILD
# quadratic in n — the last documented scale cap (r6: k capped at 4096,
# cells forced to grow past ~1 M vectors).  The two-level quantizer is
# the standard fix (faiss coarse-quantizer-over-centroids): ~√k coarse
# branches, each holding ~√k fine centroids.  Assignment = nearest
# coarse branch (O(n·√k·d)) then nearest fine centroid WITHIN that
# branch only (O(n·√k·d)) — total O(n·√k·d), so the build leg scales
# like n^1.5/√250 instead of n²/250.
#
# The fine level is trained per branch on a deterministic bounded sample
# (first rows by id within the branch — same seeding contract as
# build_ivf), driver-side NumPy Lloyd: √k small k-means problems, never
# distributed work.  The probe picks branches first, then reads ONLY
# those branches' fine centroids (a pushed filter on the centroids
# table), then partition-prunes the vector scan exactly like flat IVF.

HIER_IVF_MIN_CELLS = 256
# total rows the fine-training sample may collect to the driver
# (≈64 MiB at dim 64, ≈0.5 GiB at dim 512)
HIER_SAMPLE_CAP = 131_072
# driver-memory budget for loading a quantizer (k·d doubles ≈ 2 GiB);
# load_ivf_centroids warns past it — see its docstring for remediation
CENTROID_LOAD_BUDGET_FLOATS = 268_435_456


def build_hierarchical_ivf(
    embs: DataFrame,
    n_cells: int,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    branch_factor: int | None = None,
    sample_per_branch: int | None = None,
    fine_iterations: int = 1,
):
    """Build the two-level quantizer + assignments.

    Returns (coarse_centroids, fine_rows, assigned) where fine_rows is
    ``[(ivf_cell, ivf_branch, centroid), ...]`` with cell ids contiguous
    in (branch, local) order, and assigned carries both ``ivf_branch``
    and ``ivf_cell``.

    ``fine_iterations`` distributed Lloyd passes refine the
    sample-trained fine centroids against the FULL corpus (cells keep
    their branch; only the centroid moves): per pass, one map-side-
    combined k-row aggregate + one branch-local re-assignment.  The
    sample alone leaves cells ~1.5× oversized at the tail — the flat
    quantizer's full-corpus refinement is what balanced it, so the
    hierarchy does the same one level down."""
    import math

    k_coarse = branch_factor or max(2, int(round(math.sqrt(n_cells))))
    coarse, assigned = build_ivf(
        embs, k_coarse, iterations, id_col, vec_col, arrow=True
    )
    # the coarse assignment feeds FOUR downstream passes (census,
    # sample, fine assignment, the caller's write) — persist it once
    # (MEMORY_AND_DISK) instead of re-running the scan+matmul per pass.
    # The 100 TB deployment materializes this step to storage; callers
    # release the local cache via the `_gs_unpersist` handle attached
    # to the returned frame.
    branched = assigned.withColumnRenamed(
        "ivf_cell", "ivf_branch"
    ).persist()

    # fine-centroid budget per branch ∝ branch POPULATION — a fixed
    # per-branch count re-creates the imbalance the hierarchy exists to
    # avoid (the first cut of this operator gave every branch √k cells;
    # big branches then produced 3×-oversized cells and the within-cell
    # pair join re-inherited the skew).  The census is one √k-row agg.
    sizes = {
        int(r.ivf_branch): int(r.n)
        for r in branched.groupBy("ivf_branch")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(sizes.values()) or 1
    kb_for = {
        b: max(1, round(n_cells * n / n_total)) for b, n in sizes.items()
    }

    # per-branch training sample: bounded (≥8 rows per fine centroid,
    # capped) so the driver-side collect is O(√k · cap), corpus-free.
    # Hash-ordered, not id-ordered: consecutive ids are correlated in
    # most corpora (ingest order), and a k-means trained on one corner
    # of the branch splits that corner finely and leaves the rest to a
    # handful of catch-all cells.
    from pyspark.sql import Window

    w = Window.partitionBy("ivf_branch").orderBy(
        F.xxhash64(F.col(id_col)), F.col(id_col)
    )
    spb_for = {
        b: (sample_per_branch
            or min(max(kb_for[b] * 8, 128), 4096))
        for b in sizes
    }
    # global driver-memory guard: per-branch caps alone still sum to
    # ~8·k rows (≈2 M at the 262 k-cell formula cap) — scale every
    # branch's sample down proportionally so the collect never exceeds
    # HIER_SAMPLE_CAP rows regardless of k (fewer samples per fine
    # centroid trades training sharpness, and the full-corpus fine
    # Lloyd pass below recovers most of it)
    total = sum(min(spb_for[b], sizes[b]) for b in sizes)
    if total > HIER_SAMPLE_CAP:
        shrink = HIER_SAMPLE_CAP / total
        spb_for = {b: max(32, int(s * shrink)) for b, s in spb_for.items()}
    # the per-branch cap must be enforced IN THE PLAN, not after the
    # collect: filtering on the global max cap would pull min(size_b,
    # max_cap) rows from EVERY branch — on a skewed corpus (one 4096-cap
    # branch among hundreds of small-cap ones) that collects ~10× the
    # budget to the driver before Python discards it
    limit_map = F.create_map(
        *[F.lit(x) for b, s in spb_for.items() for x in (b, s)]
    )
    samp = (
        branched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.element_at(limit_map,
                                             F.col("ivf_branch")))
        .select("ivf_branch", vec_col)
        .collect()
    )
    by_branch: dict[int, list] = {}
    for r in samp:
        by_branch.setdefault(int(r[0]), []).append(
            [float(x) for x in r[1]]
        )

    fine_by_branch: dict[int, np.ndarray] = {}
    for b, rows in by_branch.items():
        X = np.asarray(rows, dtype=np.float64)
        fine_by_branch[b] = _kmeans_np(X, min(kb_for[b], len(X)),
                                       iterations=4)

    offsets: dict[int, int] = {}
    cell_branch: dict[int, int] = {}
    off = 0
    for b in sorted(fine_by_branch):
        offsets[b] = off
        for j in range(len(fine_by_branch[b])):
            cell_branch[off + j] = b
        off += len(fine_by_branch[b])

    assigned_fine = _assign_cells_branch_pandas(
        branched, fine_by_branch, offsets, vec_col
    )
    dim = len(next(iter(fine_by_branch.values()))[0])
    for _ in range(fine_iterations):
        rows = _cell_sums(assigned_fine, vec_col, dim).collect()
        for r in rows:
            if r.n > 0 and r.ivf_cell is not None:
                b = cell_branch[int(r.ivf_cell)]
                local = int(r.ivf_cell) - offsets[b]
                fine_by_branch[b][local] = np.asarray(
                    [s / r.n for s in r.vsum]
                )
        assigned_fine = _assign_cells_branch_pandas(
            branched, fine_by_branch, offsets, vec_col
        )
    fine_rows = [
        (offsets[b] + j, b, [float(x) for x in c])
        for b in sorted(fine_by_branch)
        for j, c in enumerate(fine_by_branch[b])
    ]
    assigned_fine._gs_unpersist = branched.unpersist
    return coarse, fine_rows, assigned_fine


def _assign_cells_branch_pandas(
    df: DataFrame, fine_by_branch: dict, offsets: dict, vec_col: str
) -> DataFrame:
    """Fine assignment scoring ONLY the row's own branch: per Arrow
    batch, group rows by branch and matmul each group against that
    branch's (normalized, transposed) centroid matrix.  The closure
    carries all fine centroids (k·d doubles) — the same budget as the
    flat path's single matrix, just partitioned by branch."""
    from pyspark.sql.functions import pandas_udf

    # one shared normalize-and-transpose (_normalized_t) everywhere —
    # the probe parity contract depends on identical normalization in
    # every scoring site
    mats = {int(b): _normalized_t(C) for b, C in fine_by_branch.items()}
    offs = {int(b): int(o) for b, o in offsets.items()}

    @pandas_udf("int")
    def _cell(v: pd.Series, br: pd.Series) -> pd.Series:
        X = np.asarray(v.to_list(), dtype=np.float64)
        brv = br.to_numpy()
        out = np.empty(len(X), dtype="int32")
        for b in np.unique(brv):
            m = brv == b
            out[m] = offs[int(b)] + np.argmax(
                X[m] @ mats[int(b)], axis=1
            ).astype("int32")
        return pd.Series(out)

    return df.withColumn("ivf_cell", _cell(F.col(vec_col), F.col("ivf_branch")))


def ivf_topk(
    assigned: DataFrame,
    centroids,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest cells only — the scan reads
    ~nprobe/n_centroids of the corpus (a partition-pruned read when the
    table is written partitioned by ivf_cell)."""
    qn = _py_norm(query_vec)
    sims = [
        sum(a * b for a, b in zip(c, query_vec)) / (_py_norm(c) * qn)
        for c in centroids
    ]
    probe = sorted(range(len(sims)), key=lambda i: -sims[i])[:nprobe]
    q = _lit_vec(query_vec)
    return (
        assigned.filter(F.col("ivf_cell").isin(probe))
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def write_ivf_index(
    embs: DataFrame,
    path: str,
    n_centroids: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hierarchical: bool | None = None,
) -> list:
    """Materialize the IVF index: the corpus written partitioned by
    `ivf_cell` plus a `centroids` side table.  This is the 100 TB
    layout — the probe becomes a partition-pruned scan reading
    ~nprobe/n_centroids of the data (see ivf_topk_from_index).

    Past HIER_IVF_MIN_CELLS cells (``hierarchical=None`` auto-selects)
    the quantizer is two-level: flat assignment is O(n·k·d) and with
    k ∝ n that made the BUILD quadratic — the r6 scale cap.  The
    hierarchical index adds a ``coarse`` side table (branch centroids)
    and an ``ivf_branch`` column on the centroids table; the vector
    layout is IDENTICAL (partitioned by ivf_cell), so every probe and
    the cell-blocked near-dup read the same files either way.

    ``ivf_cell`` / ``ivf_branch`` are THIS operator's output columns —
    an input already carrying them (an index's vectors read back for a
    re-train; a hierarchical build persists ivf_branch in the data
    files) is stale routing metadata and is dropped before assignment,
    not duplicated (the 100× sweep caught the ambiguous-reference
    failure on exactly that path)."""
    if hierarchical is None:
        hierarchical = n_centroids > HIER_IVF_MIN_CELLS
    embs = embs.drop("ivf_cell", "ivf_branch")
    spark = embs.sparkSession
    if hierarchical:
        coarse, fine_rows, assigned = build_hierarchical_ivf(
            embs, n_centroids, iterations, id_col, vec_col
        )
        cent_df = spark.createDataFrame(
            fine_rows,
            "ivf_cell int, ivf_branch int, centroid array<double>",
        )
        coarse_rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(coarse)
        ]
        spark.createDataFrame(
            coarse_rows, "ivf_branch int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/coarse")
        centroids = [c for _, _, c in fine_rows]
        n_cells_out = len(fine_rows)
    else:
        centroids, assigned = build_ivf(
            embs, n_centroids, iterations, id_col, vec_col
        )
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "ivf_cell int, centroid array<double>",
        )
        n_cells_out = n_centroids
        # a REBUILD from hierarchical to flat (corpus shrank past the
        # threshold) must remove the old coarse side table — its
        # presence is how every probe detects a hierarchical index
        import shutil as _shutil

        _shutil.rmtree(f"{path}/coarse", ignore_errors=True)
    (
        # cluster rows by cell before the partitioned write: one task
        # per cell → one file per cell instead of (tasks × cells)
        # small files; at 100 TB raise the repartition width to get
        # multiple right-sized files per cell
        assigned.repartition(n_cells_out, "ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/vectors")
    )
    getattr(assigned, "_gs_unpersist", lambda: None)()
    cent_df.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return centroids


def append_to_ivf_index(
    new_embs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stage_dir: str | None = None,
) -> None:
    """Incremental index update: assign NEW vectors to the EXISTING
    centroids and append them into the cell-partitioned layout — no
    rebuild, no historical read.  This is how a production ANN index
    absorbs the daily embedding batch: centroids stay fixed between
    periodic re-trains (quantization drifts only as the distribution
    does), the append touches just the new rows, and every subsequent
    probe sees old + new vectors through the same partition-pruned scan.

    Dynamic partition overwrite is NOT used — mode('append') adds files
    to existing `ivf_cell=` directories; re-running a failed batch is
    the caller's idempotency concern (wrap with the W8 offset guard or
    dedup on `vec_id` downstream).  ``stage_dir`` redirects the write
    there (mode overwrite, same ivf_cell partitioning) WITHOUT touching
    the live index — the exactly-once streaming maintainer
    (streaming/ann.maintain_ann_index_stream) stages each batch and
    publishes it with deterministic file names.

    A hierarchical index (``coarse/`` present) routes the new batch the
    same way the build did: coarse branch first, then fine assignment
    scoring only that branch's centroids."""
    import os as _os

    spark = new_embs.sparkSession
    cents = _scan(spark, f"{path}/centroids")
    if _os.path.isdir(f"{path}/coarse"):
        coarse_by_id = {
            int(r.ivf_branch): list(r.centroid)
            for r in _scan(spark, f"{path}/coarse").collect()
        }
        fine_by_branch: dict[int, list] = {}
        offsets: dict[int, int] = {}
        for r in cents.orderBy("ivf_cell").collect():
            b = int(r.ivf_branch)
            offsets.setdefault(b, int(r.ivf_cell))
            fine_by_branch.setdefault(b, []).append(list(r.centroid))
        # only route to branches that HAVE fine centroids: a coarse
        # cell that was empty at build time has none, and a new vector
        # landing there must go to its next-nearest populated branch
        live = sorted(b for b in coarse_by_id if b in fine_by_branch)
        pos_map = F.create_map(*[
            x for i, b in enumerate(live) for x in (F.lit(i), F.lit(b))
        ])
        branched = (
            assign_cells(new_embs, [coarse_by_id[b] for b in live], vec_col)
            .withColumn("ivf_branch",
                        F.element_at(pos_map, F.col("ivf_cell")))
            .drop("ivf_cell")
        )
        assigned = _assign_cells_branch_pandas(
            branched, fine_by_branch, offsets, vec_col
        )
        n_cells = sum(len(v) for v in fine_by_branch.values())
    else:
        centroids = [
            list(r.centroid) for r in cents.orderBy("ivf_cell").collect()
        ]
        assigned = assign_cells(new_embs, centroids, vec_col)
        n_cells = len(centroids)
    if stage_dir is not None:
        (
            assigned.repartition(n_cells, "ivf_cell")
            .write.mode("overwrite")
            .partitionBy("ivf_cell")
            .parquet(stage_dir)
        )
        return
    (
        assigned.repartition(n_cells, "ivf_cell")
        .write.mode("append")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/vectors")
    )


def _done_batch_ids(path: str) -> set:
    """Batch ids holding a committed ``_append_batches/N.done`` marker
    — the single source of truth for the replay-safety gates in BOTH
    compact_ivf_index and retrain_ivf_index (the two must agree on
    which published files belong to a crashed-but-unmarked batch, or a
    replay window reopens in whichever one drifts)."""
    import os as _os

    mdir = f"{path}/_append_batches"
    if not _os.path.isdir(mdir):
        return set()
    return {
        f[: -len(".done")]
        for f in _os.listdir(mdir)
        if f.endswith(".done")
    }


def _batch_id_of(filename: str):
    """The maintain-stream batch id encoded in a published vector file
    name (``b{N}-{i}.parquet`` — maintain_ann_index_stream's
    deterministic publish names), or None for ordinary part files."""
    import re as _re

    m = _re.match(r"b(\d+)-", filename)
    return m.group(1) if m and filename.endswith(".parquet") else None


def compact_ivf_index(
    spark,
    path: str,
    target_files: int = 1,
    min_files: int = 2,
    subtree: str = "vectors",
) -> list:
    """Compact fragmented IVF cells: every ``append_to_ivf_index`` adds
    files to the ``ivf_cell=`` directories, so a daily-append deployment
    accumulates a small-files problem exactly like the event archive's
    W10 — and gets the same fix.  Cells holding ≥ ``min_files`` data
    files are rewritten to ~``target_files`` each in ONE partition-pruned
    Spark job, then each cell directory is ATOMICALLY swapped via the
    archive's renameat2(RENAME_EXCHANGE) helper — a concurrent probe
    never observes a missing cell (rename-pair fallback where the
    syscall is unavailable, same contract as ``compact_day``).

    Returns the compacted cell ids.  O(fragmented cells) driver-side
    listing; the rewrite reads only fragmented cells' data.

    Concurrency contract: an ``append_to_ivf_index`` may land files in
    a cell BETWEEN this function's snapshot and its swap.  The rewrite
    reads an explicit per-cell FILE SNAPSHOT (not the live directory),
    and after the swap any file that appeared post-snapshot is MOVED
    into the compacted directory before the old one is deleted — a
    concurrent append is preserved, never silently dropped.  (Without
    a table format's transaction log this is the strongest guarantee a
    directory layout offers; serialize maintenance jobs regardless.)

    Crash recovery: a ``_MANIFEST.json`` written beside the rewrite
    records each cell's snapshot files and compacted-output files, so
    the next invocation can heal a crash at ANY point without losing a
    concurrent append: leftover files that are neither snapshot
    originals (already represented in the compacted data) nor rewrite
    outputs are post-snapshot appends and get moved into the live
    directory before cleanup.  Cell discovery accepts only exact
    ``ivf_cell=<int>`` names so leftovers can never corrupt a later
    run or partition discovery.

    Refresh semantics: the atomic swap protects LISTING-time readers —
    a DataFrame planned before compaction holds the pre-swap file list
    and must re-plan (spark.read again / REFRESH TABLE) afterwards,
    the standard Spark contract for any overwritten path."""
    import json as _json
    import os as _os
    import re as _re
    import shutil as _shutil

    from garmadon_spark.sinks.archive import _exchange_dirs

    # ``subtree`` selects WHICH cell-partitioned tree to compact: the
    # raw "vectors" (default), or "codes" on a persisted IVF-PQ index —
    # both fragment identically under streaming appends and share the
    # b{N}-* naming, so the whole protocol (marker gate, manifest heal,
    # atomic swap, concurrent-append rescue) applies unchanged
    vec = f"{path}/{subtree}"
    stale_tmp = vec + "._compact_tmp"
    _heal_compact_crash(vec, stale_tmp)

    # Replay-safety gate: a streaming append batch that crashed BETWEEN
    # publish and marker will be REPLAYED by maintain_ann_index_stream,
    # which deletes the batch's ``b{N}-*.parquet`` leftovers before
    # re-publishing.  If compaction folds those leftovers into compacted
    # part-files first, the replay finds nothing to delete and the
    # batch's rows land twice.  So: any cell holding a batch-named file
    # whose ``_append_batches/N.done`` marker is absent is SKIPPED this
    # run — the next compaction (after the replay marks the batch) picks
    # it up.  O(markers + files-per-fragmented-cell) driver-side.
    done = _done_batch_ids(path)

    def _unmarked(files: list[str]) -> bool:
        for f in files:
            bid = _batch_id_of(_os.path.basename(f))
            if bid is not None and bid not in done:
                return True
        return False

    snapshot: dict[int, list[str]] = {}
    for entry in sorted(_os.listdir(vec)):
        m = _re.fullmatch(r"ivf_cell=(\d+)", entry)
        if not m:
            continue
        files = [
            _os.path.join(vec, entry, f)
            for f in _os.listdir(_os.path.join(vec, entry))
            if f.endswith(".parquet")
        ]
        if len(files) >= min_files and not _unmarked(files):
            snapshot[int(m.group(1))] = files
    if not snapshot:
        return []
    frag = sorted(snapshot)
    tmp = stale_tmp
    all_files = [f for files in snapshot.values() for f in files]
    df = spark.read.parquet(*all_files)
    # ivf_cell is a directory-partition column; reading explicit files
    # loses it, so recover it from the path
    df = df.withColumn(
        "ivf_cell",
        F.regexp_extract(F.input_file_name(), r"ivf_cell=(\d+)", 1)
        .cast("int"),
    )
    part_keys = ["ivf_cell"]
    if target_files > 1:
        # salt so each cell splits into ~target_files write tasks —
        # repartitioning on the cell alone puts the whole cell in one
        # task and always yields one file.  The salt is a DETERMINISTIC
        # function of the row's data: a nondeterministic key (rand,
        # monotonic id) under a retried shuffle-map task re-routes rows
        # to partitions already consumed — the SPARK-23207 hazard
        df = df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                   F.lit(target_files)),
        )
        part_keys = ["ivf_cell", "_salt"]
    (
        df.repartition(len(frag) * max(target_files, 1), *part_keys)
        .drop("_salt")
        .write.partitionBy("ivf_cell").mode("overwrite").parquet(tmp)
    )
    # manifest BEFORE any swap: snapshot originals + rewrite outputs
    # per cell, so a crash anywhere in the swap loop is healable
    # without guessing which leftover files are concurrent appends.
    # A cell whose snapshot files hold zero rows produces NO tmp dir
    # (partitioned writes skip empty partitions) — materialize an empty
    # one so the swap uniformly replaces the degenerate cell instead of
    # aborting on the missing directory
    for c in frag:
        _os.makedirs(f"{tmp}/ivf_cell={c}", exist_ok=True)
    outputs = {
        c: [f for f in _os.listdir(f"{tmp}/ivf_cell={c}")
            if f.endswith(".parquet")]
        for c in frag
    }
    with open(f"{tmp}/_MANIFEST.json", "w") as fh:
        _json.dump({
            "snapshot": {str(c): [_os.path.basename(f)
                                  for f in snapshot[c]]
                         for c in frag},
            "outputs": {str(c): outputs[c] for c in frag},
        }, fh)
    for c in frag:
        src = f"{tmp}/ivf_cell={c}"
        dst = f"{vec}/ivf_cell={c}"
        if _exchange_dirs(src, dst):
            old = src   # now holds the pre-compaction files
        else:
            old = dst + "._compact_bak"
            _os.rename(dst, old)
            _os.rename(src, dst)
        # preserve files a concurrent append landed after the snapshot
        seen = {_os.path.basename(f) for f in snapshot[c]}
        for f in _os.listdir(old):
            if f.endswith(".parquet") and f not in seen:
                _os.rename(_os.path.join(old, f), _os.path.join(dst, f))
        _shutil.rmtree(old)
    _shutil.rmtree(tmp)
    return frag


def _heal_compact_crash(vec: str, stale_tmp: str) -> None:
    """Recover from a compact_ivf_index crash at any point.  Uses the
    run's _MANIFEST.json (written after the rewrite, before any swap)
    to classify leftover parquet files: snapshot originals are already
    represented in the compacted data (delete), rewrite outputs are
    the compacted copies (delete if unswapped), anything else is a
    CONCURRENT APPEND that landed after the snapshot — moved into the
    live cell directory, never dropped.  Without a manifest (crash
    before it was written) no swap has happened, so the live tree is
    complete and the tmp rewrite is safely discarded."""
    import json as _json
    import os as _os
    import shutil as _shutil

    manifest = None
    if _os.path.isdir(stale_tmp):
        mpath = _os.path.join(stale_tmp, "_MANIFEST.json")
        if _os.path.exists(mpath):
            manifest = _json.load(open(mpath))

    def rescue(cell_dir: str, cell: str, live: str) -> None:
        # only callable with a manifest: without it there is no way to
        # tell an appended file from an original, and moving originals
        # would duplicate their rows (the compacted data covers them)
        snap = set(manifest["snapshot"].get(cell, []))
        outs = set(manifest["outputs"].get(cell, []))
        for f in _os.listdir(cell_dir):
            if (f.endswith(".parquet") and f not in snap
                    and f not in outs and _os.path.isdir(live)):
                _os.rename(_os.path.join(cell_dir, f),
                           _os.path.join(live, f))

    # bak dirs: rename-pair path.  Live missing → crash between the
    # two renames: restore wholesale.  Live present → swap completed:
    # rescue appends (manifest permitting), drop the rest.
    for entry in list(_os.listdir(vec)):
        if entry.endswith("._compact_bak"):
            live = _os.path.join(vec, entry[: -len("._compact_bak")])
            bak = _os.path.join(vec, entry)
            if not _os.path.isdir(live):
                _os.rename(bak, live)
            else:
                if manifest is not None:
                    rescue(bak,
                           entry[len("ivf_cell="):-len("._compact_bak")],
                           live)
                _shutil.rmtree(bak)
    if _os.path.isdir(stale_tmp):
        if manifest is not None:
            for entry in list(_os.listdir(stale_tmp)):
                if not entry.startswith("ivf_cell="):
                    continue
                cell = entry[len("ivf_cell="):]
                cell_dir = _os.path.join(stale_tmp, entry)
                files = {f for f in _os.listdir(cell_dir)
                         if f.endswith(".parquet")}
                outs = set(manifest["outputs"].get(cell, []))
                if files & outs:
                    # outputs still here ⇒ this cell was never swapped
                    # ⇒ the live dir is intact; discard the rewrite
                    continue
                # swapped ⇒ tmp holds originals (+ any appends)
                rescue(cell_dir, cell, _os.path.join(vec, f"ivf_cell={cell}"))
        _shutil.rmtree(stale_tmp)


def retrain_ivf_index(
    spark,
    path: str,
    n_centroids: int | None = None,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Blue/green re-train: fit a FRESH quantizer + cell layout from the
    index's own current vectors beside the live tree, then atomically
    publish by swapping the index ROOT directories — the lifecycle step
    ``append_to_ivf_index`` explicitly defers to ("centroids stay fixed
    between periodic re-trains").  Run it when recall-after-drift
    telemetry (emb_ann_recall) crosses the deployment's floor.

    Same temp→final commit contract as the reference's offset writer
    (ProtoParquetWriterWithOffset.java:82-135: write beside, rename
    into place) and the archive's W10 compaction:

    - the rebuild happens entirely in ``<path>._retrain`` — a probe or
      serving loop reading the live index never observes a partial
      re-train;
    - the publish is one directory swap (renameat2 RENAME_EXCHANGE via
      the archive's ``_exchange_dirs``; rename-pair fallback), healed on
      the next invocation if a crash lands between the fallback's two
      renames.  The never-observes-a-partial-tree claim above is the
      RENAME_EXCHANGE path's; the fallback has a sub-millisecond window
      where the root is absent between its two renames — serving
      retries a (None, None) quantizer generation for that reason
      (streaming/ann._probe), and batch probes on a non-renameat2
      filesystem should serialize with re-trains;
    - ``_append_batches`` markers of COMMITTED streaming batches are
      carried into the new tree first: their rows are in the retrained
      corpus, so a post-swap replay must keep short-circuiting;
    - files of a PUBLISHED-BUT-UNMARKED batch (a maintain batch that
      crashed between publish and marker) are EXCLUDED from the corpus
      read and their markers not carried — that batch replays into the
      new index after the swap, so including its rows would duplicate
      them (the same window compact_ivf_index skips cells for).

    The streaming server's quantizer cache is generation-checked
    (streaming/ann.serve_ann_stream stats the side tables per trigger),
    so it picks the new tree up on the NEXT micro-batch without a
    restart; batch probes re-plan per call and see it immediately.

    Concurrency contract: serialize re-training with maintenance jobs
    (appends/compaction), the same rule compact_ivf_index states — a
    batch PUBLISHED mid-rebuild lands in the pre-retrain tree and is
    discarded with it, and its marker would wrongly short-circuit the
    replay.  (Crashed-before-the-retrain batches are handled, per
    above; in-flight-during-the-retrain ones are not detectable from a
    directory layout.)

    ``n_centroids=None`` keeps the current fine-cell count; pass the
    corpus-scaled count to re-size (cells ∝ corpus is the constant
    cell-size contract).  Returns the new centroid list."""
    import os as _os
    import shutil as _shutil

    from garmadon_spark.sinks.archive import _exchange_dirs

    staging = path + "._retrain"
    old = path + "._retrain_old"
    # heal a crashed fallback swap: live missing + old present means we
    # died between the two renames — restore the pre-retrain tree
    if not _os.path.isdir(path) and _os.path.isdir(old):
        _os.rename(old, path)
    _shutil.rmtree(old, ignore_errors=True)
    _shutil.rmtree(staging, ignore_errors=True)

    vec = f"{path}/vectors"
    done = _done_batch_ids(path)
    unmarked = set()
    for entry in _os.listdir(vec):
        if not entry.startswith("ivf_cell="):
            continue
        for f in _os.listdir(_os.path.join(vec, entry)):
            bid = _batch_id_of(f)
            if bid is not None and bid not in done:
                unmarked.add(bid)

    corpus = _scan(spark, vec)
    if unmarked:
        pat = "/b(" + "|".join(sorted(unmarked)) + r")-[^/]*\.parquet$"
        corpus = corpus.filter(~F.input_file_name().rlike(pat))
    # stale routing columns (ivf_cell, and ivf_branch on hierarchical
    # layouts) are dropped by write_ivf_index itself
    if n_centroids is None:
        n_centroids = _scan(spark, f"{path}/centroids").count()

    centroids = write_ivf_index(
        corpus, staging, n_centroids=n_centroids, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    if done:
        # copy marker CONTENT, not just presence: markers are run-scoped
        # (``done:<query-id>``, sinks/rollup._write_marker), and an empty
        # carried marker reads as legacy own-marker — which would let
        # _refuse_foreign_chain accept a fresh checkpoint over this
        # index and _marker_current silently skip colliding batch ids.
        _os.makedirs(f"{staging}/_append_batches", exist_ok=True)
        for b in sorted(done):
            _shutil.copyfile(
                f"{path}/_append_batches/{b}.done",
                f"{staging}/_append_batches/{b}.done",
            )

    if _exchange_dirs(staging, path):
        _shutil.rmtree(staging)     # now holds the pre-retrain tree
    else:
        _os.rename(path, old)
        _os.rename(staging, path)
        _shutil.rmtree(old)
    return centroids


def _normalized_t(vecs: list) -> np.ndarray:
    """Row-normalized centroid matrix, transposed for GEMV scoring.
    Row-wise normalization is row-independent, so a submatrix built
    from filtered rows is bit-identical to the same columns of the
    full matrix — the property the single-query / batched probe parity
    contract relies on."""
    C = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(C, axis=1)
    norms[norms == 0] = 1.0
    return np.ascontiguousarray((C / norms[:, None]).T)


def _top_ids_np(q: np.ndarray, ids: np.ndarray, m_t: np.ndarray,
                top: int) -> np.ndarray:
    """Top-``top`` ids by cosine against the normalized matrix, with a
    DETERMINISTIC tie-break on id (np.argsort alone is an unstable
    quicksort — exact similarity ties, e.g. duplicated centroids,
    would make two probes disagree).  One GEMV per call; both the
    driver-side single-query probe and the Arrow batch probe route
    through here so their arithmetic is identical."""
    sims = q @ m_t
    order = np.lexsort((ids, -sims))
    return ids[order[:top]]


def _branch_budget(n_cells: int, n_branches: int, nprobe: int) -> int:
    """Coarse branches to probe on a two-level index: enough to hold
    ~2·nprobe fine cells at the average branch width.  The ONE copy of
    the formula — every probe path (single/batch, IVF/IVF-PQ) routes
    through it, so the batch==single parity contract can't drift on
    the budget arithmetic."""
    kb = max(1, n_cells // max(n_branches, 1))
    return min(n_branches, max(2, -(-2 * nprobe // kb)))


def _select_probe_cells(spark, path: str, q_np, nprobe: int,
                        probe_branches: int | None = None):
    """Driver-side cell selection for ONE query against the persisted
    quantizer tables — shared by the single-query IVF and IVF-PQ
    probes.  On a hierarchical index the coarse table picks branches
    first and the fine read pushes ``ivf_branch IN (...)`` so the
    driver never loads all k fine vectors (row-wise normalization
    makes the filtered submatrix bit-identical to the same columns of
    the full matrix, so this matches the batch UDF's mask-based
    selection exactly).  Returns ``(probe_cells, fine_rows)`` with
    fine_rows restricted to the selected branches."""
    import os as _os

    cent_df = _scan(spark, f"{path}/centroids")
    if _os.path.isdir(f"{path}/coarse"):
        coarse = {
            int(r.ivf_branch): list(r.centroid)
            for r in _scan(spark, f"{path}/coarse").collect()
        }
        if probe_branches is None:
            probe_branches = _branch_budget(
                cent_df.count(), len(coarse), nprobe
            )
        bids = np.asarray(sorted(coarse), dtype=np.int64)
        bn_t = _normalized_t([coarse[int(b)] for b in bids])
        branches = [
            int(b) for b in _top_ids_np(q_np, bids, bn_t, probe_branches)
        ]
        cent_df = cent_df.filter(F.col("ivf_branch").isin(branches))
    rows = cent_df.collect()
    cells = np.asarray([int(r.ivf_cell) for r in rows], dtype=np.int64)
    cn_t = _normalized_t([list(r.centroid) for r in rows])
    probe = [int(c) for c in _top_ids_np(q_np, cells, cn_t, nprobe)]
    return probe, rows


def ivf_topk_from_index(
    spark,
    path: str,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list | None = None,
    probe_branches: int | None = None,
) -> DataFrame:
    """Probe a materialized IVF index.  The `ivf_cell IN (...)` filter
    on the partition column prunes at PLANNING time: only nprobe of the
    n_centroids directories are ever listed/read (assert via
    `explain` — the scan's `PartitionFilters`).

    On a hierarchical index the probe is two-level: score the √k coarse
    branches driver-side, then read ONLY the selected branches' fine
    centroids (`ivf_branch IN (...)` — a pushed filter on the centroids
    table, so the driver never loads all k fine vectors), then pick the
    nprobe cells among them.  ``probe_branches`` defaults to enough
    branches to hold ~2·nprobe fine cells."""
    q_np = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    probe, _rows = _select_probe_cells(
        spark, path, q_np, nprobe, probe_branches
    )
    q = _lit_vec(query_vec)
    vectors = _scan(spark, f"{path}/vectors")
    if exclude_ids:
        vectors = vectors.filter(~F.col(id_col).isin(exclude_ids))
    return (
        vectors.filter(F.col("ivf_cell").isin(probe))
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def load_ivf_centroids(spark, path: str):
    """Driver-side load of a materialized index's quantizer: fine rows
    ``(cell, branch, centroid)`` + the coarse table (empty dict on a
    flat index).  Centroid-sized (k·d·8 B — the documented broadcast
    budget), never data-sized.  A serving loop (streaming ANN) loads
    this ONCE and passes it to every ``ivf_topk_batch`` call instead of
    re-collecting the centroid table per micro-batch.

    Budget, explicitly: at the 262,144-cell formula cap
    (_ivf_cells_for) the fine table is ~128 MiB at dim 64 and ~1 GiB at
    dim 512 — fine for a serving driver, but past
    ``CENTROID_LOAD_BUDGET_FLOATS`` (k·d doubles) this logs a warning:
    the remediation is a larger per-cell target (fewer cells), a
    sharded index, or probing cell selection from the parquet side
    tables instead of a driver matrix."""
    import logging as _logging
    import os as _os

    cent = _scan(spark, f"{path}/centroids").collect()
    if cent:
        floats = len(cent) * len(cent[0].centroid)
        if floats > CENTROID_LOAD_BUDGET_FLOATS:
            _logging.getLogger(__name__).warning(
                "IVF quantizer load: %d cells x dim %d = %.2f GiB of "
                "driver memory (budget %.2f GiB) — raise the per-cell "
                "target or shard the index",
                len(cent), len(cent[0].centroid), floats * 8 / 2**30,
                CENTROID_LOAD_BUDGET_FLOATS * 8 / 2**30,
            )
    if _os.path.isdir(f"{path}/coarse"):
        coarse_by_id = {
            int(r.ivf_branch): list(r.centroid)
            for r in _scan(spark, f"{path}/coarse").collect()
        }
        fine_rows = [
            (int(r.ivf_cell), int(r.ivf_branch), list(r.centroid))
            for r in cent
        ]
    else:
        coarse_by_id = {}
        fine_rows = [(int(r.ivf_cell), 0, list(r.centroid)) for r in cent]
    return fine_rows, coarse_by_id


def _probe_cells_udf(fine_rows, coarse_by_id, nprobe, probe_branches):
    """Arrow UDF assigning each query vector its top-``nprobe`` fine
    cells through the SAME `_top_ids_np` selection the driver-side
    single-query probe uses (one GEMV per query, deterministic id
    tie-break) — identical arithmetic is what makes the exact-parity
    gate (`emb_ann_batch_check`) stable.  Hierarchical: coarse
    selection per query first, then fine scoring over only the
    selected branches' columns (row-wise normalization makes the
    submatrix bit-identical to the full matrix's columns)."""
    from pyspark.sql.functions import pandas_udf

    cells = np.asarray([c for c, _, _ in fine_rows], dtype=np.int64)
    cn_t = _normalized_t([v for _, _, v in fine_rows])
    branches = np.asarray([b for _, b, _ in fine_rows], dtype=np.int64)
    if coarse_by_id:
        bids = np.asarray(sorted(coarse_by_id), dtype=np.int64)
        bn_t = _normalized_t([coarse_by_id[int(b)] for b in bids])

    @pandas_udf("array<int>")
    def _probe(v: pd.Series) -> pd.Series:
        Q = np.asarray(v.to_list(), dtype=np.float64)
        out = []
        for i in range(Q.shape[0]):
            if coarse_by_id:
                top_b = _top_ids_np(Q[i], bids, bn_t, probe_branches)
                sel = np.isin(branches, top_b)
                picked = _top_ids_np(
                    Q[i], cells[sel],
                    np.ascontiguousarray(cn_t[:, sel]), nprobe
                )
            else:
                picked = _top_ids_np(Q[i], cells, cn_t, nprobe)
            out.append(picked.astype("int32").tolist())
        return pd.Series(out)

    return _probe


def _drop_self_rows(joined: DataFrame, id_col: str) -> DataFrame:
    """The ``exclude_self`` filter shared by both batch probes: drop
    candidate rows whose corpus id equals the query id.  When the two id
    DTYPES differ (external string/UUID query ids probed with
    ``exclude_self=True`` against a bigint corpus), a direct ``!=``
    would ANSI-cast the string to bigint and throw CAST_INVALID_INPUT
    on executors — compare both sides as strings instead (exact for
    integer ids; a fractional corpus id never string-equals an integer
    query id, which errs toward keeping the row — the safe side)."""
    dt = dict(joined.dtypes)

    def _is_num(t: str) -> bool:
        return t in ("tinyint", "smallint", "int", "bigint", "float",
                     "double") or t.startswith("decimal")

    if dt[id_col] == dt["query_id"]:
        return joined.filter(F.col(id_col) != F.col("query_id"))
    if _is_num(dt[id_col]) and _is_num(dt["query_id"]):
        # MIXED numeric widths (bigint corpus vs int/double queries):
        # 5 == 5.0 must exclude — a string render ('5' vs '5.0') would
        # not — but Spark's own coercion promotes bigint to DOUBLE,
        # which collides distinct ids above 2^53 and would DROP a real
        # neighbor.  decimal(38,9) holds every bigint exactly;
        # try_cast → null on a (pathological, >1e29) double overflow
        # and eqNullSafe keeps a row when only one side is null — both
        # rules err toward KEEPING the candidate.
        a = F.col(id_col).try_cast("decimal(38,9)")
        b = F.col("query_id").try_cast("decimal(38,9)")
        return joined.filter(~a.eqNullSafe(b))
    return joined.filter(
        F.col(id_col).cast("string") != F.col("query_id").cast("string")
    )


def _allowed_forms(allowed: DataFrame | None, id_col: str):
    """Normalize the ``allowed`` contract shared by both batch probes.

    - None → no filter;
    - ONE column → a static permitted-id list, applied to the pruned
      corpus scan BEFORE the query join (one semi-join for the whole
      batch);
    - TWO columns → PER-QUERY predicates: (query_id, corpus_id) pairs
      — multi-tenant serving, per-user ACLs — applied AFTER the query
      join as a group-wise semi-join on BOTH keys, so each query's k
      results satisfy ITS OWN allowlist.  Column order is positional:
      first = query id, second = corpus id.

    Returns ``(static_ids, per_query_pairs)`` — at most one is
    non-None."""
    if allowed is None:
        return None, None
    if len(allowed.columns) == 1:
        ids = allowed.select(
            F.col(allowed.columns[0]).alias(id_col)
        ).distinct()
        return ids, None
    pairs = allowed.select(
        F.col(allowed.columns[0]).alias("query_id"),
        F.col(allowed.columns[1]).alias(id_col),
    ).distinct()
    return None, pairs


def ivf_topk_batch(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_branches: int | None = None,
    exclude_self: bool = True,
    centroids: tuple | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Probe a materialized IVF index with a BATCH of query vectors —
    the ANN **serving** path (each micro-batch of a query stream, or an
    offline scoring job, carries many queries; the single-vector
    ``ivf_topk_from_index`` would re-plan and re-scan per query).

    Plan shape, 100 TB-first:
      1. every query gets its top-``nprobe`` cells via ONE Arrow matmul
         per batch (two-level pruned on a hierarchical index) — the
         centroid matrix rides the closure, never the data;
      2. the vector scan is filtered to the UNION of probed cells with
         a literal ``isin`` — planning-time partition pruning, bounded
         by min(n_cells, |batch|·nprobe) directories;
      3. the exploded (query, cell) table — batch-sized — is
         ``F.broadcast`` joined against the pruned scan: no shuffle of
         the corpus, ever;
      4. per-query top-k by window rank over (cosine desc, id) —
         one batch-keyed shuffle of candidate rows only.

    Parity: for any single query, rows equal ``ivf_topk_from_index``
    with the same k/nprobe (pinned by test_ann_batch_matches_single) —
    both paths select cells through the shared `_top_ids_np`, so the
    arithmetic and tie-breaks are identical.

    ``centroids``: the (fine_rows, coarse_by_id) pair from
    ``load_ivf_centroids`` — pass it to amortize the centroid-table
    read across calls (the streaming server does); None loads it here.

    ``allowed``: FILTERED search, two forms (``_allowed_forms``).  A
    ONE-column frame of permitted corpus ids (a metadata predicate
    evaluated on the source table, e.g.
    ``embs.filter(label == L).select('vec_id')``) is semi-joined into
    the pruned cell scan BEFORE the query join.  A TWO-column frame of
    (query_id, corpus_id) pairs is PER-QUERY predicates — multi-tenant
    serving, per-user ACLs — semi-joined on both keys after the query
    join.  Both apply BEFORE scoring/ranking, so every one of the k
    results satisfies its filter — never a post-filtered shortlist
    that comes back short.  The join is left to the optimizer: a
    selective predicate broadcasts (AQE sizes it), a loose one
    shuffles only the candidate rows already pruned to the probed
    cells.  Filtered recall caveat, stated honestly: nprobe bounds the
    UNFILTERED neighborhood — a very selective filter wants a larger
    nprobe (or nprobe = n_cells for exact), the standard trade every
    IVF system documents.

    The query batch (with its probed cells) is persisted so the probe
    UDF runs ONCE — the cell-union collect and the broadcast join both
    read the cached batch.  The returned DataFrame carries a
    ``_gs_unpersist`` hook; long-lived callers should invoke it after
    consuming the result."""
    if centroids is None:
        centroids = load_ivf_centroids(spark, path)
    fine_rows, coarse_by_id = centroids
    if coarse_by_id and probe_branches is None:
        probe_branches = _branch_budget(
            len(fine_rows), len(coarse_by_id), nprobe
        )
    probe = _probe_cells_udf(fine_rows, coarse_by_id, nprobe,
                             probe_branches or 0)
    planned = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qvec"),
        probe(F.col(query_vec_col)).alias("_cells"),
    ).persist()
    exploded = planned.select(
        "query_id", "_qvec", F.explode("_cells").alias("ivf_cell")
    )
    # bounded by min(n_cells, batch·nprobe) — O(cells), never O(data);
    # materializes `planned` into the cache, so this is the only
    # execution of the probe UDF
    probed = [int(r.ivf_cell)
              for r in exploded.select("ivf_cell").distinct().collect()]
    vectors = _scan(spark, f"{path}/vectors").filter(
        F.col("ivf_cell").isin(probed)
    )
    allowed_ids, allowed_pairs = _allowed_forms(allowed, id_col)
    if allowed_ids is not None:
        vectors = vectors.join(allowed_ids, id_col, "left_semi")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    joined = vectors.join(F.broadcast(exploded), "ivf_cell")
    if allowed_pairs is not None:
        # per-query predicates bind (query, candidate) pairs, so they
        # can only apply after the query join — still pre-ranking, so
        # every one of the k results satisfies its query's allowlist;
        # the candidate side is already cell-pruned, and AQE broadcasts
        # a small pair table
        joined = joined.join(allowed_pairs, ["query_id", id_col],
                             "left_semi")
    if exclude_self:
        # queries drawn from the corpus: drop the query's own row
        # (dtype-safe — string/UUID query ids must not ANSI-cast)
        joined = _drop_self_rows(joined, id_col)
    out = (
        joined
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 6)
            .alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    out._gs_unpersist = planned.unpersist
    return out


def neardup_pairs_blocked(
    embs: DataFrame,
    block_col: str = "label",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks (the vector
    analogue of blocked Jaccard).  Self-join keyed on the block column;
    at scale the block key comes from LSH/IVF cells instead of labels.

    ``max_block`` guards the O(block²) expansion the same way
    dedup.bucket_pairs does: blocks over the cap are dropped before the
    join (a block that large needs a finer blocking key, not a bigger
    join).  The size census is a tiny aggregate broadcast back as a
    semi-join, so the guard adds no extra shuffle of the vectors."""
    if max_block is not None:
        keep = (
            embs.groupBy(block_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_block)
            .select(block_col)
        )
        embs = embs.join(F.broadcast(keep), [block_col], "left_semi")
    a = embs.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = embs.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    return (
        a.join(b, ["blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "blk",
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    embs: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): turn a near-duplicate PAIR table (from any
    blocking tier — label blocks, IVF cells, LSH) into a full-corpus
    keep/drop verdict.  Pairs → connected components (transitive
    closure, dedup.components) → one representative per semantic group.

    Representative policy: the member with the largest L2 norm (rounded
    to 4 decimals so the argmax is stable across engines), tie-broken by
    smallest id — a deterministic stand-in for the paper's
    distance-to-centroid rank that needs no second pass over the
    vectors.  Vectors in no pair are their own singleton group and are
    always kept.

    Scale shape: the component loop shuffles label-sized rows (not
    vectors); the norm is computed in the same scan that reads the ids;
    the final rank is one window over ``sem_group`` — groups are
    near-dup clusters plus singletons, so partitions are tiny and the
    shuffle is one pass of (id, norm, group) triples.  The output is the
    artifact a curation pipeline writes back: every vector, its semantic
    group, and whether it survives."""
    from pyspark.sql import Window

    from garmadon_spark.operators.dedup import components

    comp = components(pairs, id_a="id_a", id_b="id_b")
    base = embs.select(
        F.col(id_col).alias("vec_id"),
        F.round(_norm(F.col(vec_col)), 4).alias("_l2"),
    )
    labeled = (
        base.join(
            comp.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
        )
        .withColumn("sem_group", F.coalesce("component", F.col("vec_id")))
    )
    w = Window.partitionBy("sem_group").orderBy(
        F.desc("_l2"), F.asc("vec_id")
    )
    return labeled.select(
        "vec_id",
        "sem_group",
        (F.row_number().over(w) == 1).alias("keep"),
    )


# --- Product quantization (PQ) -------------------------------------------
#
# Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search"
# (IEEE TPAMI 2011) — the standard memory-bound ANN representation: split
# the D-dim vector into M subspaces, k-means each subspace independently
# (KSUB centroids), store each vector as its M centroid ids (M bytes at
# KSUB ≤ 256).  A 256-dim float32 vector (1 KiB) becomes 16 bytes at
# M=16 — the difference between an embedding corpus that fits in cluster
# RAM/page-cache and one that doesn't.  Query-time scoring is ADC
# (asymmetric distance computation): one M×KSUB lookup table per query,
# each stored code scored by M table lookups — no decode, no float math
# per dimension.
#
# Scale shape: codebooks are M·KSUB·(D/M) floats (≤ ~64 KiB) and ride
# the UDF closure like the IVF centroid matrix; training reads a fixed-
# size sample (codebook quality saturates in the thousands of vectors —
# same contract as faiss `train()`); encoding is a single map-only linear
# scan; the ADC scan reads M bytes/vector instead of 4·D.  Compose with
# the IVF layout above (IVF-PQ) by encoding each cell's residuals and the
# probe reads nprobe/K of the *compressed* corpus.

PQ_TRAIN_SAMPLE = 16_384


def diverse_sample(
    embs: DataFrame,
    n_per_cell: int,
    n_cells: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: partition the embedding
    space into k-means cells (build_ivf — deterministic first-k-by-id
    seeding + Lloyd refinement), then keep a fixed per-cell quota
    chosen by HASH RANK (xxhash64 of the id, id tiebreak).  The
    curation op that keeps a subset spread across semantic space
    instead of mirroring the corpus's density — dense topic clusters
    contribute the same n_per_cell as sparse ones, the
    cluster-balanced selection curation pipelines use to counter
    scrape-frequency bias (cf. SemDeDup's cluster framing, Abbas et
    al. 2023, applied to selection rather than dedup).  Hash-rank
    selection is content-deterministic: no Math.random, stable across
    runs/engines/partitionings, and — for a FIXED quantizer — adding
    vectors to other cells never changes a cell's picks (the trained
    centroids themselves do move with the corpus; pin them by sampling
    against a persisted index's centroids when that matters).

    Scale shape: the quota filter is one window over cells — a single
    shuffle keyed by cell whose reducers stream SORTED runs (rank ≤
    quota short-circuits); cells are k-means-balanced by construction
    so the window carries no pathological skew, and at 10⁹+ rows the
    same plan holds with cells ∝ corpus (the _ivf_cells_for contract).
    Returns (id, ivf_cell, pick_rank).

    Reference analogue: the reference has no sampling tier; this
    extends the exact-count stratified sampler (text.py:331) from
    metadata strata to LEARNED strata."""
    from pyspark.sql.window import Window

    _cents, assigned = build_ivf(
        embs, n_centroids=n_cells, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    w = Window.partitionBy("ivf_cell").orderBy(
        F.xxhash64(F.col(id_col)), F.col(id_col)
    )
    return (
        assigned.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= n_per_cell)
        .select(id_col, "ivf_cell", "pick_rank")
    )


def _kmeans_np(data: "np.ndarray", k: int, iterations: int,
               init: "np.ndarray | None" = None) -> "np.ndarray":
    """Deterministic driver-side Lloyd on a sample: seed = first k rows
    (matches build_ivf's seeding contract), empty clusters keep their
    previous centroid.  Sample-sized input → O(sample·k·dsub) per round
    on the driver, never distributed work.

    ``init`` WARM-STARTS from existing centroids instead of re-seeding —
    the OPQ alternation's descent guarantee needs it: from a warm start
    every assignment step and every update step is non-increasing in
    the quantization objective, so re-fitting after a rotation update
    can only keep or improve the error (a fresh seed could regress)."""
    if init is not None:
        cents = np.asarray(init, dtype=np.float64).copy()
        k = len(cents)
    else:
        k = min(k, len(data))
        cents = data[:k].copy()
    for _ in range(iterations):
        d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cents[j] = data[mask].mean(axis=0)
    return cents


def train_pq(
    embs: DataFrame,
    m: int = 16,
    ksub: int = 64,
    iterations: int = 5,
    sample: int = PQ_TRAIN_SAMPLE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> list:
    """Train the M per-subspace codebooks on a deterministic sample
    (first `sample` vectors by id — stable across runs, like build_ivf's
    seeding).  Vectors are L2-normalized before quantization so the ADC
    inner product approximates cosine (``normalize=False`` for inputs
    that are already in the target space, e.g. IVF residuals).  Returns
    ``codebooks[m][ksub][d/m]`` as plain lists (closure-safe)."""
    rows = embs.orderBy(id_col).limit(sample).select(vec_col).collect()
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    if normalize:
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        X /= norms
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        _kmeans_np(
            np.ascontiguousarray(X[:, j * dsub:(j + 1) * dsub]),
            ksub, iterations,
        ).tolist()
        for j in range(m)
    ]


def pq_encode(
    embs: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only encode: each vector → its M nearest-subcentroid ids.

    One Arrow batch does M matmuls of (batch × dsub) @ (dsub × ksub) —
    argmin ‖x−c‖² computed as argmax (x·c − ‖c‖²/2), so no per-row
    Python.  Codes come back as array<int> for inspectability; the 100 TB
    storage form packs them to a BinaryType column of M bytes (KSUB ≤
    256) — same information, 4× narrower than the int array."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]
    half_sq = [(-0.5 * (b ** 2).sum(axis=1)) for b in books]

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        X = np.asarray(v.to_list(), dtype=np.float64)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        X /= norms
        out = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            out[:, j] = (sub @ books[j].T + half_sq[j]).argmax(axis=1)
        return pd.Series(list(out))

    return embs.select(id_col, _codes(F.col(vec_col)).alias("pq_codes"))


def pq_topk(
    codes: DataFrame,
    codebooks: list,
    query_vec,
    k: int = 10,
    rerank: int = 0,
    embs: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over the compressed corpus.

    The query's M×KSUB inner-product table is built driver-side and
    rides the closure; each stored code costs M table gathers (one
    vectorized fancy-index per Arrow batch).  With ``rerank`` > 0 the
    ADC pass only shortlists `rerank` candidates and the exact cosine
    re-scores just those — at 100 TB that is a full scan of the 16-byte
    codes plus a point lookup of `rerank` raw vectors, never a full scan
    of the float corpus.  The shortlist join broadcasts (rerank ≤
    thousands)."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    q = q / qn
    lut = np.stack([
        books[j] @ q[j * dsub:(j + 1) * dsub] for j in range(m)
    ])  # m × ksub
    idx = np.arange(m)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _adc(c: pd.Series) -> pd.Series:
        C = np.asarray(c.to_list(), dtype=np.int64)  # batch × m
        return pd.Series(lut[idx[None, :], C].sum(axis=1))

    scored = codes.select(id_col, _adc(F.col("pq_codes")).alias("adc"))
    if rerank and embs is not None:
        short = (
            scored.orderBy(F.desc("adc"), F.asc(id_col))
            .limit(rerank).select(id_col)
        )
        qcol = _lit_vec([float(x) for x in query_vec])
        return (
            embs.join(F.broadcast(short), [id_col])
            .select(
                id_col,
                F.round(cosine(F.col(vec_col), qcol), 6).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )
    return (
        scored.select(id_col, F.round(F.col("adc"), 6).alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(k)
    )


# --- IVF-PQ: coarse pruning × compressed scan ----------------------------
#
# The composition used by every billion-scale ANN deployment (faiss
# IVFxx,PQyy): the IVF coarse quantizer prunes WHICH vectors to read
# (nprobe/K of the corpus), PQ compresses WHAT is read (M bytes instead
# of 4·D).  Codes quantize the RESIDUAL x−c(x) — residual magnitudes are
# much smaller than vector magnitudes, so the same codebook budget
# carries more precision (Jégou et al., TPAMI 2011 §IV).
#
# Inner-product scoring makes the residual trick cheap on Spark: with
# normalized vectors, IP(q, x) = q·c(x) + q·r(x), and q·r decomposes per
# subspace exactly like plain PQ — so ONE query LUT serves every cell
# and the per-cell term q·c is a 64-entry literal map, not a per-cell
# table rebuild (L2-ADC would need per-cell LUTs).

def build_ivfpq(
    embs: DataFrame,
    n_centroids: int = 8,
    m: int = 16,
    ksub: int = 64,
    iterations: int = 2,
    pq_iterations: int = 5,
    sample: int = PQ_TRAIN_SAMPLE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train coarse + fine quantizers and encode the corpus.

    Returns (centroids, codebooks, codes) where codes has
    (id, ivf_cell, pq_codes).  The residual staging is a map-only
    expression after the broadcast-argmin cell assignment; at 100 TB
    `codes` is written partitioned by ivf_cell (the write_ivf_index
    layout) and is the ONLY thing the probe scans."""
    # L2-normalize in ONE Arrow batch pass.  The Column form
    # (transform(vec, x / aggregate(...))) re-evaluates the full O(dim)
    # norm aggregate for EVERY element — CollapseProject inlines the
    # norm column into the lambda, so even a two-step projection ends
    # up O(dim²) interpreted per row; the 100× build sat on a single
    # straggler task for >10 minutes before this moved to NumPy.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _l2_normalize(v: pd.Series) -> pd.Series:
        X = np.asarray(v.to_list(), dtype=np.float64)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return pd.Series(list(X / norms))

    normed = embs.withColumn(vec_col, _l2_normalize(F.col(vec_col)))
    unpersist = lambda: None  # noqa: E731
    if n_centroids > HIER_IVF_MIN_CELLS:
        # two-level coarse quantizer past the flat-build budget — same
        # cell semantics (contiguous ids), O(n·√k·d) assignment
        _, fine_rows, assigned = build_hierarchical_ivf(
            normed, n_centroids, iterations, id_col, vec_col
        )
        centroids = [c for _, _, c in fine_rows]
        unpersist = getattr(assigned, "_gs_unpersist", unpersist)
    else:
        centroids, assigned = build_ivf(
            normed, n_centroids, iterations, id_col, vec_col
        )
    if len(centroids) <= 64:
        # literal-map lookup stays codegen-sized at fixture scale (and
        # keeps the r1-r6 plan byte-identical for the oracles)
        cent_items = []
        for cid, c in enumerate(centroids):
            cent_items += [F.lit(cid), _lit_vec(c)]
        cent_col = F.element_at(F.create_map(*cent_items), F.col("ivf_cell"))
        resid_src = assigned
    else:
        # wide quantizer: the centroid table is a broadcast join, not a
        # k×d literal expression tree (which falls out of codegen and
        # bloats the plan past a few hundred cells)
        spark = embs.sparkSession
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "ivf_cell int, _cent array<double>",
        )
        resid_src = assigned.join(F.broadcast(cent_df), "ivf_cell")
        cent_col = F.col("_cent")
    resid = F.zip_with(
        F.col(vec_col), cent_col, lambda x, c: x - c,
    )
    residuals = resid_src.select(id_col, "ivf_cell", resid.alias("_resid"))
    books = train_pq(
        residuals, m=m, ksub=ksub, iterations=pq_iterations,
        sample=sample, id_col=id_col, vec_col="_resid", normalize=False,
    )
    codes = _pq_encode_raw(residuals, books, id_col, "_resid").select(
        id_col, "ivf_cell", "pq_codes"
    )
    codes._gs_unpersist = unpersist  # release the cached coarse pass
    return centroids, books, codes


def _pq_encode_raw(
    df: DataFrame, codebooks: list, id_col: str, vec_col: str
) -> DataFrame:
    """pq_encode WITHOUT the L2 re-normalization — residuals must be
    quantized as-is (they are differences of unit vectors, not unit
    vectors)."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]
    half_sq = [(-0.5 * (b ** 2).sum(axis=1)) for b in books]

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        X = np.asarray(v.to_list(), dtype=np.float64)
        out = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            out[:, j] = (sub @ books[j].T + half_sq[j]).argmax(axis=1)
        return pd.Series(list(out))

    return df.withColumn("pq_codes", _codes(F.col(vec_col)))


def ivfpq_topk(
    codes: DataFrame,
    centroids: list,
    codebooks: list,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 0,
    embs: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe nprobe cells, ADC-score their codes, optionally re-rank.

    score = q·c(cell)  (literal map lookup)  +  Σ_j LUT[j][code_j]
    The scan reads only the probed cells' M-byte codes — at 100 TB with
    the cell-partitioned layout that is (nprobe/K)·(M/4D) of a raw
    full scan; rerank adds a point lookup of shortlist vectors."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    q = q / qn
    csims = [
        float(np.dot(q, np.asarray(c)) / (np.linalg.norm(c) or 1.0))
        for c in centroids
    ]
    probe = sorted(range(len(csims)), key=lambda i: -csims[i])[:nprobe]
    qc = {cid: float(np.dot(q, np.asarray(centroids[cid]))) for cid in probe}
    lut = np.stack([
        books[j] @ q[j * dsub:(j + 1) * dsub] for j in range(m)
    ])
    idx = np.arange(m)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _adc(c: pd.Series) -> pd.Series:
        C = np.asarray(c.to_list(), dtype=np.int64)
        return pd.Series(lut[idx[None, :], C].sum(axis=1))

    qc_items = []
    for cid, v in qc.items():
        qc_items += [F.lit(cid), F.lit(v)]
    scored = (
        codes.filter(F.col("ivf_cell").isin(probe))
        .select(
            id_col,
            (
                F.element_at(F.create_map(*qc_items), F.col("ivf_cell"))
                + _adc(F.col("pq_codes"))
            ).alias("adc"),
        )
    )
    if rerank and embs is not None:
        short = (
            scored.orderBy(F.desc("adc"), F.asc(id_col))
            .limit(rerank).select(id_col)
        )
        qcol = _lit_vec([float(x) for x in query_vec])
        return (
            embs.join(F.broadcast(short), [id_col])
            .select(
                id_col,
                F.round(cosine(F.col(vec_col), qcol), 6).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )
    return (
        scored.select(id_col, F.round(F.col("adc"), 6).alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(k)
    )


# --- PCA rotation: embedding preprocessing for PQ / storage ----------------

PCA_SAMPLE_CAP = 65_536


def fit_pca(
    embs: DataFrame,
    dim_out: int | None = None,
    sample: int = PCA_SAMPLE_CAP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    center: bool = True,
):
    """Fit a PCA rotation from a bounded deterministic sample (first
    ``sample`` rows by id — the PQ codebook's training idiom): returns
    ``(mean, components, eigenvalues)`` with components as rows sorted
    by descending variance, signs fixed so each component's
    largest-|coordinate| is positive (eigensolvers are sign-ambiguous;
    without the fix two fits of the same data could disagree).

    Driver budget: sample·d floats for the sample + d² for the
    covariance — at the cap and dim 512 that is ~256 MiB transient,
    model-sized like the IVF quantizer loads.  The fit never scans the
    corpus; the corpus-wide pass is ``pca_project`` (map-only).

    Why it is here: PQ subquantizers split the vector into contiguous
    sub-blocks, so correlated coordinates inside one block waste
    codebook entropy; rotating to decorrelated axes first is the
    standard preprocessing (the PCA leg of OPQ — Ge et al., CVPR
    2013), and truncating to ``dim_out`` top axes is the
    storage/latency lever.

    ``center=False`` fits a PURE rotation (mean pinned at zero): the
    right mode in front of a cosine / inner-product search like the PQ
    tier here, because an orthonormal rotation preserves dot products
    exactly while centering does not — rotated-space neighbors are
    bit-for-bit the raw-space neighbors.  Keep the default centering
    for variance analysis / dim truncation of raw feature vectors."""
    rows = embs.orderBy(id_col).limit(sample).select(vec_col).collect()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    if X.ndim != 2 or X.shape[0] < 2:
        raise ValueError("need at least 2 sample vectors to fit PCA")
    mean = X.mean(axis=0) if center else np.zeros(X.shape[1])
    Xc = X - mean
    cov = Xc.T @ Xc / (X.shape[0] - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    for j in range(evecs.shape[1]):
        i = int(np.argmax(np.abs(evecs[:, j])))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    d_out = dim_out if dim_out is not None else X.shape[1]
    if not 1 <= d_out <= X.shape[1]:
        raise ValueError("dim_out must be in [1, input dim]")
    return mean, evecs[:, :d_out].T.copy(), evals[:d_out].copy()


def pca_project(
    embs: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project every vector onto the fitted components: ONE Arrow
    batch matmul per executor batch (pandas_udf), model riding the
    closure (d·d_out floats) — map-only, zero shuffle, the same scale
    shape as every other scoring pass in this module."""
    comp_t = np.asarray(components, dtype=np.float64).T
    mu = np.asarray(mean, dtype=np.float64)
    if comp_t.shape[0] != mu.shape[0]:
        raise ValueError("mean and components disagree on input dim")

    @F.pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy())
        P = (M - mu) @ comp_t
        return pd.Series(list(P))

    return embs.withColumn(out_col, _proj(F.col(vec_col)))


# --- OPQ: learned rotation for PQ (Ge et al., CVPR 2013, OPQ-NP) ----------


def _pca_rotation_np(X: "np.ndarray") -> "np.ndarray":
    """Full-rank PURE-rotation PCA basis of an in-memory sample (rows =
    components, descending variance, signs fixed exactly like fit_pca):
    the initializer OPQ's alternation descends from.  No centering —
    the rotation must preserve inner products exactly (fit_pca's
    ``center=False`` contract), so rotated-space cosine == raw cosine."""
    cov = X.T @ X / max(X.shape[0] - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    evecs = evecs[:, np.argsort(evals)[::-1]]
    for j in range(evecs.shape[1]):
        i = int(np.argmax(np.abs(evecs[:, j])))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    return np.ascontiguousarray(evecs.T)


def _pq_train_err_np(Z: "np.ndarray", m: int, ksub: int, iterations: int,
                     init_books: list | None = None):
    """Per-subspace Lloyd over an in-memory rotated sample; returns
    ``(codebooks, mean squared quantization error)``.  With
    ``init_books`` the fit WARM-STARTS (see _kmeans_np) — the step that
    makes the OPQ alternation a true descent."""
    dsub = Z.shape[1] // m
    books, err = [], 0.0
    for j in range(m):
        sub = np.ascontiguousarray(Z[:, j * dsub:(j + 1) * dsub])
        C = _kmeans_np(
            sub, ksub, iterations,
            init=None if init_books is None else init_books[j],
        )
        d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        err += float(d2.min(axis=1).sum())
        books.append(C)
    return books, err / max(len(Z), 1)


def fit_opq(
    embs: DataFrame,
    m: int = 16,
    ksub: int = 64,
    iterations: int = 5,
    opq_iterations: int = 6,
    sample: int = PQ_TRAIN_SAMPLE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
):
    """Learned OPQ rotation: alternating rotation ↔ codebook
    optimization (Ge et al., CVPR 2013 — the non-parametric OPQ the
    fit_pca docstring defers to) on the bounded deterministic sample
    (first ``sample`` rows by id, the train_pq idiom).

    Returns ``(rotation, codebooks, errs)``: rotation is the d×d
    orthonormal matrix as a list of rows (apply x → R·x, i.e. X @ R.T);
    codebooks live in ROTATED space; ``errs[i]`` is the mean squared
    quantization error on the training sample after alternation i, with
    ``errs[0]`` the PCA-initialized error.

    The descent is NON-INCREASING by construction — each alternation
    step either solves its subproblem exactly or warm-starts:

    - codes: nearest-centroid encode (optimal given R and codebooks);
    - rotation: orthogonal Procrustes — the R minimizing ‖X·Rᵀ − Y‖_F
      for the fixed reconstructions Y, exact via one SVD of XᵀY
      (R = (U·Vᵀ)ᵀ);
    - codebooks: warm-started Lloyd (assignment then update, each
      non-increasing).

    Hence ``errs[-1] ≤ errs[0]`` always — the inequality the
    emb_opq gate pins.  Against RAW-space PQ nothing is guaranteed in
    general (on isotropic data the PCA init can start slightly worse);
    on the repo fixture the learned rotation lands ~15 % under raw.

    Driver budget: sample·d floats plus the per-subspace n×ksub
    distance matrix — the same transient model-fit load as train_pq /
    fit_pca; the corpus is never scanned here."""
    rows = embs.orderBy(id_col).limit(sample).select(vec_col).collect()
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    if X.ndim != 2 or X.shape[0] < 2:
        raise ValueError("need at least 2 sample vectors to fit OPQ")
    if normalize:
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        X /= norms
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    R = _pca_rotation_np(X)
    Z = X @ R.T
    books, err = _pq_train_err_np(Z, m, ksub, iterations)
    errs = [err]
    for _ in range(opq_iterations):
        Y = np.empty_like(Z)
        for j in range(m):
            sub = Z[:, j * dsub:(j + 1) * dsub]
            B = books[j]
            d2 = ((sub[:, None, :] - B[None, :, :]) ** 2).sum(axis=2)
            Y[:, j * dsub:(j + 1) * dsub] = B[d2.argmin(axis=1)]
        U, _s, Vt = np.linalg.svd(X.T @ Y)
        R = np.ascontiguousarray((U @ Vt).T)
        Z = X @ R.T
        books, err = _pq_train_err_np(Z, m, ksub, 1, init_books=books)
        errs.append(err)
    return ([row.tolist() for row in R],
            [b.tolist() for b in books],
            errs)


def pq_quantization_error(
    embs: DataFrame,
    codebooks: list,
    rotation: list | None = None,
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Corpus-wide mean squared PQ reconstruction error — the number
    the OPQ gate compares across rotations: ONE Arrow map pass (per-row
    error, M small matmuls per batch) + one scalar aggregate.  Returns
    a 1-row DataFrame ``(mse, n)``.  Map-only then a partial-aggregated
    scalar — a linear scan at any corpus size."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]
    R = (None if rotation is None
         else np.asarray(rotation, dtype=np.float64))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _err(v: pd.Series) -> pd.Series:
        X = np.asarray(v.to_list(), dtype=np.float64)
        if normalize:
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            X = X / norms
        if R is not None:
            X = X @ R.T
        tot = np.zeros(len(X))
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            tot += d2.min(axis=1)
        return pd.Series(tot)

    return embs.select(_err(F.col(vec_col)).alias("_qe")).agg(
        F.avg("_qe").alias("mse"), F.count(F.lit(1)).alias("n")
    )


# --- persisted IVF-PQ index: layout + probes + blue/green lifecycle -------
#
# The persisted form of build_ivfpq and the billion-scale serving
# layout (faiss "OPQd,IVFk,PQm"): the IVF tree write_ivf_index already
# materializes, extended with three side artifacts —
#
#     path/centroids, path/coarse        write_ivf_index's quantizer
#     path/vectors/ivf_cell=N/           UNIT vectors, ROTATED space
#     path/rotation                      optional OPQ rotation (d rows)
#     path/codebooks                     m×ksub residual codebooks
#     path/codes/ivf_cell=N/             (id, pq_codes) mirror of vectors
#
# Vectors are L2-normalized (and OPQ-rotated) BEFORE the IVF build, so
# every existing tree operator — append_to_ivf_index, compact_ivf_index,
# retrain_ivf_index, rerank cosines — operates in one consistent space:
# the rotation is orthonormal, rotated-space cosine == raw cosine
# exactly, and queries are rotated driver-side at probe time (d² mults).
# Codes quantize the residual x − c(x) (Jégou et al., TPAMI 2011 §IV)
# with codebooks trained on a bounded residual sample, exactly like
# build_ivfpq's in-memory form.


def _rotate_normalize(embs: DataFrame, rotation: list | None,
                      vec_col: str) -> DataFrame:
    """L2-normalize (and optionally rotate) every vector in ONE Arrow
    batch pass — the preprocessing in front of the persisted IVF-PQ
    build and its appends.  Map-only, zero shuffle."""
    R = (None if rotation is None
         else np.asarray(rotation, dtype=np.float64))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _prep(v: pd.Series) -> pd.Series:
        X = np.asarray(v.to_list(), dtype=np.float64)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        X = X / norms
        if R is not None:
            X = X @ R.T
        return pd.Series(list(X))

    return embs.withColumn(vec_col, _prep(F.col(vec_col)))


def _index_residuals(spark, path: str, id_col: str, vec_col: str,
                     source: DataFrame | None = None):
    """Residual x − c(x) of (a subset of) an index's vectors against
    its OWN centroid table: a broadcast join on ivf_cell (the centroid
    table is quantizer-sized), then one zip_with — map-only after the
    broadcast.  Returns ``(residuals(id, ivf_cell, _resid), n_cells)``."""
    assigned = (_scan(spark, f"{path}/vectors")
                if source is None else source)
    cent_df = (
        _scan(spark, f"{path}/centroids")
        .select("ivf_cell", F.col("centroid").alias("_cent"))
    )
    n_cells = cent_df.count()
    resid = (
        assigned.join(F.broadcast(cent_df), "ivf_cell")
        .select(
            id_col, "ivf_cell",
            F.zip_with(
                F.col(vec_col).cast("array<double>"), F.col("_cent"),
                lambda x, c: x - c,
            ).alias("_resid"),
        )
    )
    return resid, n_cells


def _write_pq_sidecar(
    spark, path: str, m: int, ksub: int, pq_iterations: int,
    sample: int, id_col: str, vec_col: str,
) -> list:
    """Train residual codebooks from the index's own vectors and
    materialize the ``codebooks`` + cell-partitioned ``codes`` side
    artifacts.  Shared by write_ivfpq_index and retrain_ivfpq_index so
    the two can never drift on the encode pipeline."""
    resid, n_cells = _index_residuals(spark, path, id_col, vec_col)
    books = train_pq(
        resid, m=m, ksub=ksub, iterations=pq_iterations, sample=sample,
        id_col=id_col, vec_col="_resid", normalize=False,
    )
    codes = _pq_encode_raw(resid, books, id_col, "_resid").select(
        id_col, "ivf_cell", "pq_codes"
    )
    (
        codes.repartition(n_cells, "ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/codes")
    )
    rows = [
        (j, c, [float(x) for x in books[j][c]])
        for j in range(len(books)) for c in range(len(books[j]))
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, center array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    return books


def write_ivfpq_index(
    embs: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 16,
    ksub: int = 64,
    iterations: int = 2,
    pq_iterations: int = 5,
    sample: int = PQ_TRAIN_SAMPLE,
    opq: bool = False,
    opq_iterations: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Materialize the IVF-PQ index (layout in the section comment).
    With ``opq=True`` the corpus is first rotated by a learned OPQ
    rotation (fit_opq) — PQ subquantizers stop wasting codebook entropy
    on correlated coordinate blocks; the rotation is persisted so
    probes, appends and re-trains stay in the same space.

    Returns ``(centroids, codebooks)``.  Scale shape: fit_opq/train_pq
    are bounded-sample driver fits; the corpus passes are the IVF build
    (write_ivf_index's O(n·√k·d) path past HIER_IVF_MIN_CELLS), one
    broadcast-join residual pass, one encode pass — no extra shuffle
    beyond the cell-clustered writes."""
    import shutil as _shutil

    spark = embs.sparkSession
    embs = embs.drop("ivf_cell", "ivf_branch")
    rotation = None
    if opq:
        rotation, _books, _errs = fit_opq(
            embs, m=m, ksub=ksub, iterations=pq_iterations,
            opq_iterations=opq_iterations, sample=sample,
            id_col=id_col, vec_col=vec_col,
        )
    prep = _rotate_normalize(embs, rotation, vec_col)
    centroids = write_ivf_index(
        prep, path, n_centroids=n_centroids, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    if rotation is not None:
        spark.createDataFrame(
            [(i, row) for i, row in enumerate(rotation)],
            "axis int, row array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/rotation")
    else:
        _shutil.rmtree(f"{path}/rotation", ignore_errors=True)
    books = _write_pq_sidecar(
        spark, path, m=m, ksub=ksub, pq_iterations=pq_iterations,
        sample=sample, id_col=id_col, vec_col=vec_col,
    )
    return centroids, books


def load_pq_codebooks(spark, path: str) -> list:
    """The persisted residual codebooks, nested-list form (model-sized:
    m·ksub·dsub doubles)."""
    rows = (
        _scan(spark, f"{path}/codebooks")
        .orderBy("subspace", "code").collect()
    )
    books: dict = {}
    for r in rows:
        books.setdefault(int(r.subspace), []).append(list(r.center))
    return [books[j] for j in sorted(books)]


def load_opq_rotation(spark, path: str) -> list | None:
    """The persisted OPQ rotation (rows = output axes), or None for an
    unrotated index."""
    import os as _os

    if not _os.path.isdir(f"{path}/rotation"):
        return None
    rows = _scan(spark, f"{path}/rotation").orderBy("axis").collect()
    return [list(r.row) for r in rows]


def load_ivfpq_quantizer(spark, path: str) -> tuple:
    """The persisted IVF-PQ index's ENTIRE quantizer stack in one
    driver-sized object: ``(fine_rows, coarse_by_id, books, rotation)``
    — the coarse/fine centroid tables (load_ivf_centroids), the
    residual codebooks as float64 arrays, and the OPQ rotation (None
    for an unrotated index).  k·d + m·ksub·dsub + d² doubles.  This is
    the unit the streaming server caches per quantizer GENERATION: a
    blue/green re-train swaps all four together (atomic root swap), so
    caching them as one tuple can never mix stacks."""
    books = [np.asarray(b, dtype=np.float64)
             for b in load_pq_codebooks(spark, path)]
    rotation = load_opq_rotation(spark, path)
    fine_rows, coarse_by_id = load_ivf_centroids(spark, path)
    return fine_rows, coarse_by_id, books, rotation


def ivfpq_topk_from_index(
    spark,
    path: str,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list | None = None,
) -> DataFrame:
    """ADC probe of the persisted IVF-PQ tree: normalize (then rotate,
    if the index is OPQ) the query driver-side, select nprobe cells
    against the centroid table, scan ONLY those cells' codes — the same
    planning-time ``ivf_cell IN (...)`` partition pruning as
    ivf_topk_from_index, but over M-byte codes instead of 4·D-byte
    vectors: (nprobe/K)·(M/4D) of a raw scan.  score = q·c(cell) +
    Σ_j LUT[j][code_j] (ivfpq_topk's residual decomposition — one query
    LUT serves every cell).  ``rerank`` > 0 re-scores a shortlist with
    exact cosine from the vectors tree (broadcast semi-join point
    lookup, pruned to the same cells)."""
    books = load_pq_codebooks(spark, path)
    rotation = load_opq_rotation(spark, path)
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    if rotation is not None:
        q = np.asarray(rotation, dtype=np.float64) @ q
    # cell selection routes through the SAME shared helper as the
    # plain-IVF single probe (two-level on a hierarchical index, fine
    # read pushed-filtered to the selected branches — the driver never
    # loads all k fine vectors), with the same branch budget as the
    # batch UDF: the batch==single parity contract holds structurally
    probe, fine_rows = _select_probe_cells(spark, path, q, nprobe)
    cent_by_id = {int(r.ivf_cell): list(r.centroid) for r in fine_rows}
    qc_items = []
    for cid in probe:
        qc_items += [
            F.lit(cid),
            F.lit(float(np.dot(q, np.asarray(cent_by_id[cid])))),
        ]

    bks = [np.asarray(b, dtype=np.float64) for b in books]
    mm = len(bks)
    dsub = bks[0].shape[1]
    lut = np.stack([
        bks[j] @ q[j * dsub:(j + 1) * dsub] for j in range(mm)
    ])
    idx = np.arange(mm)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _adc(c: pd.Series) -> pd.Series:
        C = np.asarray(c.to_list(), dtype=np.int64)
        return pd.Series(lut[idx[None, :], C].sum(axis=1))

    codes = _scan(spark, f"{path}/codes")
    if exclude_ids:
        codes = codes.filter(~F.col(id_col).isin(exclude_ids))
    scored = (
        codes.filter(F.col("ivf_cell").isin(probe))
        .select(
            id_col,
            (
                F.element_at(F.create_map(*qc_items), F.col("ivf_cell"))
                + _adc(F.col("pq_codes"))
            ).alias("adc"),
        )
    )
    if rerank:
        short = (
            scored.orderBy(F.desc("adc"), F.asc(id_col))
            .limit(rerank).select(id_col)
        )
        vectors = (
            _scan(spark, f"{path}/vectors")
            .filter(F.col("ivf_cell").isin(probe))
        )
        qcol = _lit_vec([float(x) for x in q])
        return (
            vectors.join(F.broadcast(short), [id_col])
            .select(
                id_col,
                F.round(cosine(F.col(vec_col), qcol), 6).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )
    return (
        scored.select(id_col, F.round(F.col("adc"), 6).alias("adc"))
        .orderBy(F.desc("adc"), F.asc(id_col))
        .limit(k)
    )


def append_to_ivfpq_index(
    new_embs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stage_dir: str | None = None,
) -> None:
    """Incremental IVF-PQ update: normalize/rotate the batch into the
    index's space, append vectors via append_to_ivf_index (frozen
    centroids), then encode the SAME rows' residuals with the FROZEN
    codebooks and append their codes — quantizers stay fixed between
    re-trains, exactly the append_to_ivf_index contract extended to the
    codes mirror.

    ``stage_dir`` mirrors append_to_ivf_index's staging redirect:
    vectors land in ``{stage_dir}/vectors`` and codes in
    ``{stage_dir}/codes`` (both mode-overwrite, cell-partitioned)
    WITHOUT touching the live tree — the exactly-once streaming
    maintainer stages then publishes under deterministic names, and a
    replay regenerates both identically (same frozen quantizers).

    Crash window of the DIRECT (non-staged) path, documented: vectors
    append before codes in two non-atomic writes, so a crash between
    them leaves the batch probe-visible in the vectors tree but absent
    from codes — rerank probes still see the rows, ADC scans do not.
    ``emb_ivfpq_lifecycle_check``'s codes_mirror_vectors gate detects
    it; ``sync_ivfpq_codes`` heals it (re-encode exactly the missing
    rows with the frozen codebooks).  Re-running the whole failed
    append instead would duplicate the vector rows — the same caller
    idempotency caveat append_to_ivf_index documents; exactly-once
    appends belong to maintain_ivfpq_index_stream."""
    import shutil as _shutil

    spark = new_embs.sparkSession
    rotation = load_opq_rotation(spark, path)
    prep = _rotate_normalize(
        new_embs.drop("ivf_cell", "ivf_branch"), rotation, vec_col
    )
    # the batch is ALWAYS assigned through append_to_ivf_index's staged
    # path (which routes hierarchical indexes correctly), then the codes
    # are encoded from the SAME staged assignment — vector and code
    # routing can never disagree
    staged = stage_dir is not None
    vec_stage = (f"{stage_dir}/vectors" if staged
                 else f"{path}/._pq_append_stage/vectors")
    append_to_ivf_index(
        prep, path, id_col=id_col, vec_col=vec_col, stage_dir=vec_stage
    )
    assigned = _scan(spark, vec_stage)
    resid, n_cells = _index_residuals(
        spark, path, id_col, vec_col, source=assigned
    )
    books = load_pq_codebooks(spark, path)
    codes = _pq_encode_raw(resid, books, id_col, "_resid").select(
        id_col, "ivf_cell", "pq_codes"
    )
    if staged:
        (
            codes.repartition(n_cells, "ivf_cell")
            .write.mode("overwrite")
            .partitionBy("ivf_cell")
            .parquet(f"{stage_dir}/codes")
        )
        return
    (
        assigned.repartition(n_cells, "ivf_cell")
        .write.mode("append")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/vectors")
    )
    (
        codes.repartition(n_cells, "ivf_cell")
        .write.mode("append")
        .partitionBy("ivf_cell")
        .parquet(f"{path}/codes")
    )
    _shutil.rmtree(f"{path}/._pq_append_stage", ignore_errors=True)


def sync_ivfpq_codes(
    spark,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Heal append_to_ivfpq_index's direct-path crash window: encode
    any vector rows MISSING from the codes tree (one anti-join on the
    id) with the FROZEN codebooks and append their codes — after this,
    codes mirror vectors again and the ADC scan covers every row.
    Idempotent (healing twice appends nothing) and read-bounded by the
    missing set.  Returns the number of rows healed."""
    vecs = _scan(spark, f"{path}/vectors")
    have = _scan(spark, f"{path}/codes").select(id_col)
    missing = vecs.join(have, [id_col], "left_anti")
    resid, n_cells = _index_residuals(
        spark, path, id_col, vec_col, source=missing
    )
    books = load_pq_codebooks(spark, path)
    codes = _pq_encode_raw(resid, books, id_col, "_resid").select(
        id_col, "ivf_cell", "pq_codes"
    )
    codes = codes.persist()
    n = codes.count()
    if n:
        (
            codes.repartition(n_cells, "ivf_cell")
            .write.mode("append")
            .partitionBy("ivf_cell")
            .parquet(f"{path}/codes")
        )
    codes.unpersist()
    return int(n)


def ivf_index_health(spark, path: str) -> DataFrame:
    """Operational health report for a persisted IVF / IVF-PQ index —
    the numbers an operator reads before scheduling maintenance on a
    large deployment, as ONE summary row:

    - rows / cells / files / bytes per tree and the worst
      files-per-cell fragmentation (`max_files_per_cell` drifting up
      under streaming appends is the compact_ivf_index trigger),
    - cell-population skew (`max_cell_rows` vs `avg_cell_rows` — a hot
      cell slows EVERY probe that selects it; the re-train knob),
    - vectors↔codes divergence (`missing_codes`: rows ADC serving
      cannot see until sync_ivfpq_codes heals them; `orphan_codes`:
      codes whose vector is gone — both 0 on a healthy index, and both
      NULL for a plain IVF index with no codes tree),
    - `unmarked_batches`: published ``b{N}-*`` files whose
      ``_append_batches`` marker is absent — a crashed maintain-stream
      batch the next replay will rewrite (compaction already skips
      these cells; a count that never drains means the checkpoint died
      with it).

    Driver work is O(files + cells) listing plus cells-bounded
    aggregates; the divergence counts are two anti-join COUNTS, never
    collected rows.  Complements (not replaces) the per-run telemetry:
    this is pull-based introspection of the on-disk artifact itself."""
    import os as _os

    def _tree(sub: str):
        root = f"{path}/{sub}"
        if not _os.path.isdir(root):
            return None
        files = 0
        bts = 0
        per_cell: dict[str, int] = {}
        batch_ids: set = set()
        for entry in _os.listdir(root):
            cdir = _os.path.join(root, entry)
            if not (entry.startswith("ivf_cell=") and _os.path.isdir(cdir)):
                continue
            n_here = 0
            for f in _os.listdir(cdir):
                if not f.endswith(".parquet"):
                    continue
                n_here += 1
                try:
                    bts += _os.path.getsize(_os.path.join(cdir, f))
                except OSError:
                    pass
                bid = _batch_id_of(f)
                if bid is not None:
                    batch_ids.add(bid)
            files += n_here
            per_cell[entry] = n_here
        return {
            "files": files,
            "bytes": bts,
            "max_files_per_cell": max(per_cell.values(), default=0),
            "batch_ids": batch_ids,
        }

    vec_t = _tree("vectors")
    if vec_t is None:
        raise ValueError(f"no vectors tree under {path} — not an index")
    code_t = _tree("codes")

    vecs = _scan(spark, f"{path}/vectors")
    cell_rows = [
        int(r["count"])
        for r in vecs.groupBy("ivf_cell").count().collect()
    ]
    n_vec = sum(cell_rows)
    done = _done_batch_ids(path)
    unmarked = {b for t in (vec_t, code_t) if t
                for b in t["batch_ids"] if b not in done}

    if code_t is not None:
        codes = _scan(spark, f"{path}/codes")
        n_codes = codes.count()
        missing = vecs.select("vec_id").join(
            codes.select("vec_id"), ["vec_id"], "left_anti").count()
        orphans = codes.select("vec_id").join(
            vecs.select("vec_id"), ["vec_id"], "left_anti").count()
    else:
        n_codes = missing = orphans = None

    cells = _scan(spark, f"{path}/centroids").count()
    row = (
        int(n_vec), None if n_codes is None else int(n_codes),
        int(cells), len(cell_rows),
        int(vec_t["files"]), int(vec_t["bytes"]),
        int(vec_t["max_files_per_cell"]),
        None if code_t is None else int(code_t["files"]),
        None if code_t is None else int(code_t["bytes"]),
        None if code_t is None else int(code_t["max_files_per_cell"]),
        int(max(cell_rows, default=0)),
        round(n_vec / len(cell_rows), 2) if cell_rows else 0.0,
        None if missing is None else int(missing),
        None if orphans is None else int(orphans),
        len(unmarked),
    )
    return spark.createDataFrame(
        [row],
        "vectors_rows bigint, codes_rows bigint, cells bigint,"
        " populated_cells int, vector_files int, vector_bytes bigint,"
        " vector_max_files_per_cell int, code_files int,"
        " code_bytes bigint, code_max_files_per_cell int,"
        " max_cell_rows bigint, avg_cell_rows double,"
        " missing_codes bigint, orphan_codes bigint,"
        " unmarked_batches int",
    )


def retrain_ivfpq_index(
    spark,
    path: str,
    n_centroids: int | None = None,
    m: int | None = None,
    ksub: int | None = None,
    iterations: int = 2,
    pq_iterations: int = 5,
    sample: int = PQ_TRAIN_SAMPLE,
    refit_rotation: bool = True,
    opq_iterations: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Blue/green re-train of the ENTIRE IVF-PQ quantizer stack —
    coarse cells, OPQ rotation, AND the residual codebooks — the PQ
    half of the lifecycle retrain_ivf_index covers for the flat layout
    (without this, a PQ deployment under drift could re-fit its coarse
    layer but kept stale codebooks: quantization error drifting
    unmeasured on the ADC path).

    Same contract as retrain_ivf_index, same mechanics:

    - rebuild entirely in ``<path>._retrain``; ONE atomic root swap
      (renameat2 RENAME_EXCHANGE, healed rename-pair fallback);
    - committed ``_append_batches`` markers carried WITH their content
      (run scoping survives); published-but-unmarked batches EXCLUDED
      from the corpus read (codes are REBUILT from that read, so the
      exclusion covers both trees — their old ``b{N}-*`` files are
      discarded with the pre-retrain root) and their replay lands
      exactly once;
    - serialize with appends/compaction (the same directory-layout
      limit retrain_ivf_index documents).

    The index's stored vectors already live in (rotated) unit space; a
    rotation refit therefore learns an INCREMENTAL rotation on the
    stored space and persists the COMPOSITION R_new·R_old, so external
    raw queries keep working through one stored matrix.  Rotation
    refit only applies to an index built with ``opq=True``
    (``refit_rotation`` is ignored otherwise); a retrain never ADDS a
    rotation to an unrotated index — the stored vectors would have to
    be rewritten into the new space, which is a rebuild, not a refit
    (``write_ivfpq_index(opq=True)`` over the corpus).

    Returns ``(centroids, codebooks)``."""
    import os as _os
    import shutil as _shutil

    from garmadon_spark.sinks.archive import _exchange_dirs

    staging = path + "._retrain"
    old = path + "._retrain_old"
    if not _os.path.isdir(path) and _os.path.isdir(old):
        _os.rename(old, path)
    _shutil.rmtree(old, ignore_errors=True)
    _shutil.rmtree(staging, ignore_errors=True)

    vec = f"{path}/vectors"
    done = _done_batch_ids(path)
    unmarked = set()
    for entry in _os.listdir(vec):
        if not entry.startswith("ivf_cell="):
            continue
        for f in _os.listdir(_os.path.join(vec, entry)):
            bid = _batch_id_of(f)
            if bid is not None and bid not in done:
                unmarked.add(bid)

    corpus = _scan(spark, vec)
    if unmarked:
        pat = "/b(" + "|".join(sorted(unmarked)) + r")-[^/]*\.parquet$"
        corpus = corpus.filter(~F.input_file_name().rlike(pat))
    if n_centroids is None:
        n_centroids = _scan(spark, f"{path}/centroids").count()
    old_books = load_pq_codebooks(spark, path)
    if m is None:
        m = len(old_books)
    if ksub is None:
        ksub = len(old_books[0])
    old_rotation = load_opq_rotation(spark, path)

    rotation = None
    inc_rotation = None
    if old_rotation is not None and refit_rotation:
        # stored vectors are already unit-norm in the OLD rotated space:
        # fit the incremental rotation there (normalize=True is a no-op
        # on unit vectors but harmless), then compose for persistence
        inc_rotation, _b, _e = fit_opq(
            corpus, m=m, ksub=ksub, iterations=pq_iterations,
            opq_iterations=opq_iterations, sample=sample,
            id_col=id_col, vec_col=vec_col,
        )
        rotation = (
            np.asarray(inc_rotation) @ np.asarray(old_rotation)
        ).tolist()
    elif old_rotation is not None:
        rotation = old_rotation

    prep = _rotate_normalize(
        corpus.drop("ivf_cell", "ivf_branch"), inc_rotation, vec_col
    )
    centroids = write_ivf_index(
        prep, staging, n_centroids=n_centroids, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    if rotation is not None:
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(rotation)],
            "axis int, row array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{staging}/rotation"
        )
    books = _write_pq_sidecar(
        spark, staging, m=m, ksub=ksub, pq_iterations=pq_iterations,
        sample=sample, id_col=id_col, vec_col=vec_col,
    )
    if done:
        # content-preserving carry — see retrain_ivf_index
        _os.makedirs(f"{staging}/_append_batches", exist_ok=True)
        for b in sorted(done):
            _shutil.copyfile(
                f"{path}/_append_batches/{b}.done",
                f"{staging}/_append_batches/{b}.done",
            )

    if _exchange_dirs(staging, path):
        _shutil.rmtree(staging)
    else:
        _os.rename(path, old)
        _os.rename(staging, path)
        _shutil.rmtree(old)
    return centroids, books


def ivfpq_topk_batch(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 0,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    queries_in_index_space: bool = False,
    quantizer: tuple | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Probe a persisted IVF-PQ index with a BATCH of query vectors —
    ivf_topk_batch's plan shape over the M-byte codes tree:

      1. queries are normalized (and OPQ-rotated, unless
         ``queries_in_index_space`` says they already live in the
         index's space — e.g. rows read back from the index itself)
         and each gets its top-``nprobe`` cells via the SAME
         ``_probe_cells_udf`` arithmetic as every other probe;
      2. the CODES scan partition-prunes to the union of probed cells
         (``isin`` literal — planning time), reading M bytes/vector;
      3. the batch-sized (query, cell) table broadcast-joins the pruned
         scan; ADC scoring is ONE Arrow pass with the per-query LUT
         tensor (|batch|·m·ksub doubles) riding the closure —
         score = q·c(cell) + Σ_j LUT[q][j][code_j];
      4. per-query shortlist by window rank; with ``rerank`` > 0 the
         exact cosine re-scores shortlist rows from the vectors tree
         (broadcast shortlist join, pruned to the same cells).

    Driver budget: the query batch is collected once to build the LUT
    tensor — batch-sized, the serving contract ivf_topk_batch already
    sets (its probe UDF closure carries the same batch).  Returns
    (query_id, vec_id, cosine|adc, rank); carries ``_gs_unpersist``.

    ``quantizer``: a preloaded load_ivfpq_quantizer tuple — the
    streaming server passes its generation-checked cache here so a
    long-running serve loop reads the quantizer side tables once per
    re-train, not once per micro-batch (the ivf_topk_batch
    ``centroids=`` contract extended to rotation + codebooks).

    ``allowed``: FILTERED search — the ivf_topk_batch contract: a
    one-column frame of permitted corpus ids semi-joined into the
    pruned CODES scan before ADC scoring, or a two-column
    (query_id, corpus_id) pair frame for PER-QUERY predicates
    (group-wise semi-join after the query join) — either way
    shortlist, rerank, and the final k all satisfy the predicate;
    same nprobe-vs-selectivity trade documented there."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    if quantizer is None:
        quantizer = load_ivfpq_quantizer(spark, path)
    fine_rows, coarse_by_id, books, rotation = quantizer
    books = [np.asarray(b, dtype=np.float64) for b in books]
    m = len(books)
    dsub = books[0].shape[1]
    ksub = books[0].shape[0]
    probe_branches = (_branch_budget(len(fine_rows), len(coarse_by_id),
                                     nprobe)
                      if coarse_by_id else 0)
    probe = _probe_cells_udf(fine_rows, coarse_by_id, nprobe,
                             probe_branches)
    # the SAME preprocessing pass the build/append path uses — reusing
    # _rotate_normalize (rather than a local twin) is what keeps the
    # probe's query space from silently diverging from the index's
    planned = _rotate_normalize(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("_qvec"),
        ),
        None if queries_in_index_space else rotation,
        "_qvec",
    ).select(
        "query_id", "_qvec", probe(F.col("_qvec")).alias("_cells")
    ).persist()
    exploded = planned.select(
        "query_id", F.explode("_cells").alias("ivf_cell")
    )
    probed = [int(r.ivf_cell)
              for r in exploded.select("ivf_cell").distinct().collect()]

    # batch-sized driver collect: per-query LUT tensor + query matrix.
    # qpos keys on the RAW id value (no integer cast) so string/UUID
    # query ids work exactly like in ivf_topk_batch — pandas hands the
    # UDF np.int64 for long ids, which hash-equals the Python int key
    qrows = planned.select("query_id", "_qvec").collect()
    Qmat = np.asarray([list(r._qvec) for r in qrows], dtype=np.float64)
    qpos = {r.query_id: i for i, r in enumerate(qrows)}
    lut = np.empty((len(qrows), m, ksub), dtype=np.float64)
    for j in range(m):
        lut[:, j, :] = Qmat[:, j * dsub:(j + 1) * dsub] @ books[j].T
    cent_ids = np.asarray([c for c, _, _ in fine_rows], dtype=np.int64)
    Cmat = np.asarray([v for _, _, v in fine_rows], dtype=np.float64)
    cpos = {int(c): i for i, c in enumerate(cent_ids)}
    jidx = np.arange(m)

    @pandas_udf("double")
    def _adc(qid: pd.Series, cell: pd.Series, codes: pd.Series
             ) -> pd.Series:
        qi = np.asarray([qpos[x] for x in qid], dtype=np.int64)
        ci = np.asarray([cpos[int(x)] for x in cell], dtype=np.int64)
        C = np.asarray(codes.to_list(), dtype=np.int64)
        qc = (Qmat[qi] * Cmat[ci]).sum(axis=1)
        adc = lut[qi[:, None], jidx[None, :], C].sum(axis=1)
        return pd.Series(qc + adc)

    codes_df = _scan(spark, f"{path}/codes").filter(
        F.col("ivf_cell").isin(probed)
    )
    allowed_ids, allowed_pairs = _allowed_forms(allowed, id_col)
    if allowed_ids is not None:
        codes_df = codes_df.join(allowed_ids, id_col, "left_semi")
    joined = codes_df.join(F.broadcast(exploded), "ivf_cell")
    if allowed_pairs is not None:
        # per-query form: group-wise semi-join after the query join,
        # before ADC scoring — shortlist, rerank, and the final k all
        # satisfy each query's own allowlist
        joined = joined.join(allowed_pairs, ["query_id", id_col],
                             "left_semi")
    if exclude_self:
        # dtype-safe: string/UUID query ids vs bigint vec ids must
        # compare without an ANSI cast (r10 advisor finding)
        joined = _drop_self_rows(joined, id_col)
    scored = joined.select(
        "query_id", id_col,
        _adc(F.col("query_id"), F.col("ivf_cell"),
             F.col("pq_codes")).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc(id_col)
    )
    if not rerank:
        out = (
            scored.select(
                "query_id", id_col, F.round("adc", 6).alias("adc")
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        out._gs_unpersist = planned.unpersist
        return out
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("query_id", id_col)
    )
    vectors = _scan(spark, f"{path}/vectors").filter(
        F.col("ivf_cell").isin(probed)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    out = (
        vectors.join(F.broadcast(short), [id_col])
        .join(F.broadcast(planned.select("query_id", "_qvec")),
              "query_id")
        .select(
            "query_id", id_col,
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 6)
            .alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
    )
    out._gs_unpersist = planned.unpersist
    return out

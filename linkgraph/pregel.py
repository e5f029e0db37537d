"""Pregel-style superstep runner over CSR blocks (SURVEY.md §2.10).

Execution model per superstep (all per-edge work is vectorized numpy inside
Arrow-batched cogrouped pandas UDFs — zero per-row Python):

    scatter : cogroup(blocks, state) on part_id -> block-local numpy
              gather + per-udst pre-aggregation (np.bincount / minimum.at)
    combine : one shuffle — groupBy(dst).sum/min or (dst,label) count
    apply   : left join back onto state + column expressions
    stats   : single driver-side scalar row (convergence / change count)
    persist : checkpoint write + read-back (durable, truncates lineage) or
              localCheckpoint (ephemeral) — either way the plan for t+1 is
              one superstep deep (op 54)

The scatter shuffle carries at most |udst| rows per block (unique dsts), not
nnz — the block-local bincount is the map-side combine.  Skewed hub dsts are
therefore bounded by P partial rows each; the explicit salted two-phase
aggregation for raw message streams lives in skew.py and is used by the
naive (non-CSR) paths.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager, input_fingerprint
from .csr import build_csr_blocks, symmetrize
from .derive import GraphTables
from .skew import split_hub_edges


@dataclass
class GraphContext:
    """Built once per graph; blocks cached across supersteps."""

    spark: SparkSession
    P: int
    n_vertices: int
    vertex_base: DataFrame          # vid, part_id, dangling (cached)
    blocks: DataFrame               # directed CSR (cached)
    ublocks: DataFrame              # symmetrized undirected CSR (cached)
    nnz_directed: int
    nnz_undirected: int
    fingerprint: str
    hub_edges: DataFrame | None = None   # src, dst, coeff (op 47 hub split)
    hub_vids: DataFrame | None = None    # vid (broadcast into hub scatter)
    nnz_hub: int = 0
    _cached_inputs: tuple = ()

    @staticmethod
    def build(graph: GraphTables, P: int, hub_theta: int | None = None) -> "GraphContext":
        """hub_theta: out-degree above which a vertex's adjacency is pulled
        out of the CSR blocks and scattered via broadcast-join (skew.py).

        All static context tables are EAGERLY materialized with
        ``localCheckpoint`` rather than ``persist``: a cached plan that still
        embeds broadcast subqueries re-executes those subqueries (and their
        whole upstream derivation) on every job that references it — which
        turned each superstep into a full graph re-derivation.  Truncating
        the lineage makes the per-superstep plan reference only materialized
        RDDs.  (On a multi-executor cluster, executor loss invalidates a
        localCheckpoint; the durable recovery path is the checkpoint
        manager + re-running GraphContext.build, which is cheap relative to
        the iteration itself.)"""
        spark = graph.edges.sparkSession
        # cache the derivation once: vertices/edges plans are embedded in
        # every downstream table (degrees, blocks, fingerprint).
        graph.vertices.persist()
        n = graph.vertices.count()
        graph.edges.persist()
        graph.edges.count()
        base = (
            graph.degrees.select(
                "vid",
                F.pmod(F.col("vid"), F.lit(P)).cast("int").alias("part_id"),
                (F.col("out_deg") == 0).alias("dangling"),
            )
            .repartition(P, "part_id")
            .localCheckpoint()
        )
        hub_edges = hub_vids = None
        nnz_hub = 0
        pr_edges = graph.edges
        if hub_theta is not None:
            non_hub, hub_e = split_hub_edges(graph.edges, graph.degrees, hub_theta)
            hub_edges = hub_e.repartition(P, "src", "dst").localCheckpoint()
            nnz_hub = hub_edges.count()
            if nnz_hub == 0:
                hub_edges = None
            else:
                hub_vids = (
                    hub_edges.select("src").distinct().withColumnRenamed("src", "vid").localCheckpoint()
                )
            pr_edges = non_hub
        blocks = build_csr_blocks(pr_edges, n, P).localCheckpoint()
        ublocks = build_csr_blocks(symmetrize(graph.edges), n, P).localCheckpoint()
        nnz_d = blocks.agg(F.sum("nnz")).collect()[0][0] or 0
        nnz_u = ublocks.agg(F.sum("nnz")).collect()[0][0] or 0
        fp = input_fingerprint(graph.edges)
        return GraphContext(
            spark, P, n, base, blocks, ublocks, int(nnz_d), int(nnz_u), fp,
            hub_edges=hub_edges, hub_vids=hub_vids, nnz_hub=int(nnz_hub),
            _cached_inputs=(graph.vertices, graph.edges),
        )

    def unpersist(self) -> None:
        for df in self._cached_inputs:
            df.unpersist()


def _block_arrays(b: pd.Series):
    return (
        np.asarray(b["indptr"], dtype=np.int64),
        np.asarray(b["indices"], dtype=np.int64),
        np.asarray(b["coeff"], dtype=np.float64),
        np.asarray(b["udst"], dtype=np.int64),
        np.asarray(b["e2u"], dtype=np.int64),
    )


def _local_values(right: pd.DataFrame, col: str, p: int, P: int, nloc: int) -> np.ndarray:
    """Scatter a state column into residue-class-local dense order."""
    vids = right["vid"].to_numpy(np.int64)
    vals = right[col].to_numpy()
    arr = np.zeros(nloc, dtype=vals.dtype)
    arr[(vids - p) // P] = vals
    return arr


# --------------------------------------------------------------------------
# vertex programs
# --------------------------------------------------------------------------

class PageRankProgram:
    """Weighted PageRank w/ uniform dangling redistribution (op 48)."""

    name = "pagerank"
    state_cols = ["vid", "part_id", "dangling", "rank"]
    uses_undirected = False

    def __init__(self, d: float = 0.85, tol: float = 1e-6):
        self.d, self.tol = d, tol

    def init_state(self, ctx: GraphContext) -> DataFrame:
        return ctx.vertex_base.withColumn("rank", F.lit(1.0 / ctx.n_vertices))

    def scatter_schema(self) -> str:
        return "dst long, msum double"

    def make_scatter(self, P: int):
        def scatter(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0 or len(right) == 0:
                return pd.DataFrame({"dst": np.empty(0, np.int64), "msum": np.empty(0, np.float64)})
            b = left.iloc[0]
            p, nloc = int(b["part_id"]), int(b["n_local"])
            indptr, _indices, coeff, udst, e2u = _block_arrays(b)
            rank = _local_values(right, "rank", p, P, nloc).astype(np.float64)
            contrib = np.repeat(rank, np.diff(indptr)) * coeff
            partial = np.bincount(e2u, weights=contrib, minlength=len(udst))
            return pd.DataFrame({"dst": udst, "msum": partial})

        return scatter

    def superstep(self, ctx: GraphContext, state: DataFrame, carry: dict | None = None) -> DataFrame:
        d, n = self.d, ctx.n_vertices
        # dangling mass of state_{t-1}: carried from the previous superstep's
        # stats row (saves one job per superstep); computed directly only on
        # the first superstep after init/resume.
        if carry is not None and "dangling_mass" in carry:
            dmass = carry["dangling_mass"] or 0.0
        else:
            dmass = state.where("dangling").agg(F.sum("rank")).collect()[0][0] or 0.0
        msgs = (
            ctx.blocks.groupby("part_id")
            .cogroup(state.groupby("part_id"))
            .applyInPandas(self.make_scatter(ctx.P), self.scatter_schema())
        )
        if ctx.hub_edges is not None:
            # op 47: hub adjacency scattered by broadcast-join — hub state is
            # tiny, hub edges stay hash-spread, no straggler partition.
            hub_state = state.join(F.broadcast(ctx.hub_vids), "vid").select(
                F.col("vid").alias("src"), "rank"
            )
            hub_msgs = (
                ctx.hub_edges.join(F.broadcast(hub_state), "src")
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("coeff")).alias("msum"))
            )
            msgs = msgs.unionByName(hub_msgs)
        acc = msgs.groupBy("dst").agg(F.sum("msum").alias("msum"))
        return (
            state.join(acc.withColumnRenamed("dst", "vid"), "vid", "left")
            .select(
                "vid",
                "part_id",
                "dangling",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * (F.coalesce("msum", F.lit(0.0)) + F.lit(dmass / n))
                ).alias("rank"),
                F.abs(
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * (F.coalesce("msum", F.lit(0.0)) + F.lit(dmass / n))
                    - F.col("rank")
                ).alias("_delta"),
            )
        )

    def stat_exprs(self):
        return [
            F.max("_delta").alias("delta"),
            F.sum("rank").alias("rank_sum"),
            F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))).alias("dangling_mass"),
        ]

    stat_reducers = {"delta": max, "rank_sum": sum, "dangling_mass": sum}

    def done(self, stats: dict) -> bool:
        return stats["delta"] < self.tol


class ComponentsProgram:
    """Connected components via hash-min label propagation (op 49)."""

    name = "components"
    state_cols = ["vid", "part_id", "comp"]
    uses_undirected = True

    def init_state(self, ctx: GraphContext) -> DataFrame:
        return ctx.vertex_base.select("vid", "part_id", F.col("vid").alias("comp"))

    def scatter_schema(self) -> str:
        return "dst long, mmin long"

    def make_scatter(self, P: int):
        def scatter(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0 or len(right) == 0:
                return pd.DataFrame({"dst": np.empty(0, np.int64), "mmin": np.empty(0, np.int64)})
            b = left.iloc[0]
            p, nloc = int(b["part_id"]), int(b["n_local"])
            indptr, _indices, _coeff, udst, e2u = _block_arrays(b)
            comp = _local_values(right, "comp", p, P, nloc).astype(np.int64)
            comp_rep = np.repeat(comp, np.diff(indptr))
            partial = np.full(len(udst), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(partial, e2u, comp_rep)
            return pd.DataFrame({"dst": udst, "mmin": partial})

        return scatter

    def superstep(self, ctx: GraphContext, state: DataFrame, carry: dict | None = None) -> DataFrame:
        msgs = (
            ctx.ublocks.groupby("part_id")
            .cogroup(state.groupby("part_id"))
            .applyInPandas(self.make_scatter(ctx.P), self.scatter_schema())
        )
        acc = msgs.groupBy("dst").agg(F.min("mmin").alias("mmin"))
        return (
            state.join(acc.withColumnRenamed("dst", "vid"), "vid", "left")
            .select(
                "vid",
                "part_id",
                F.least(F.col("comp"), F.coalesce("mmin", F.col("comp"))).alias("comp"),
                (F.coalesce("mmin", F.col("comp")) < F.col("comp")).cast("long").alias("_changed"),
            )
        )

    def stat_exprs(self):
        return [F.sum("_changed").alias("changes")]

    stat_reducers = {"changes": sum}

    def done(self, stats: dict) -> bool:
        return stats["changes"] == 0


class LabelPropProgram:
    """Synchronous community label propagation, min-label tiebreak (op 50).

    Matches ref_single_node.lpa_ref exactly: new label = most frequent
    neighbor label over the undirected simple graph; ties -> min label;
    isolated vertices keep their label."""

    name = "labelprop"
    state_cols = ["vid", "part_id", "label"]
    uses_undirected = True

    def init_state(self, ctx: GraphContext) -> DataFrame:
        return ctx.vertex_base.select("vid", "part_id", F.col("vid").alias("label"))

    def scatter_schema(self) -> str:
        return "dst long, label long, cnt long"

    def make_scatter(self, P: int):
        def scatter(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"dst": np.empty(0, np.int64), "label": np.empty(0, np.int64), "cnt": np.empty(0, np.int64)}
            )
            if len(left) == 0 or len(right) == 0:
                return empty
            b = left.iloc[0]
            p, nloc = int(b["part_id"]), int(b["n_local"])
            indptr, _indices, _coeff, udst, e2u = _block_arrays(b)
            label = _local_values(right, "label", p, P, nloc).astype(np.int64)
            lab_rep = np.repeat(label, np.diff(indptr))
            # run-length count of (udst_idx, label) pairs
            order = np.lexsort((lab_rep, e2u))
            ui, ll = e2u[order], lab_rep[order]
            if len(ui) == 0:
                return empty
            boundary = np.ones(len(ui), dtype=bool)
            boundary[1:] = (ui[1:] != ui[:-1]) | (ll[1:] != ll[:-1])
            idx = np.flatnonzero(boundary)
            cnt = np.diff(np.append(idx, len(ui)))
            return pd.DataFrame(
                {"dst": udst[ui[boundary]], "label": ll[boundary], "cnt": cnt}
            )

        return scatter

    def superstep(self, ctx: GraphContext, state: DataFrame, carry: dict | None = None) -> DataFrame:
        msgs = (
            ctx.ublocks.groupby("part_id")
            .cogroup(state.groupby("part_id"))
            .applyInPandas(self.make_scatter(ctx.P), self.scatter_schema())
        )
        counts = msgs.groupBy("dst", "label").agg(F.sum("cnt").alias("cnt"))
        w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("label"))
        winner = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col("dst").alias("vid"), F.col("label").alias("new_label"))
        )
        return (
            state.join(winner, "vid", "left")
            .select(
                "vid",
                "part_id",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).cast("long").alias("_changed"),
            )
        )

    def stat_exprs(self):
        return [F.sum("_changed").alias("changes")]

    stat_reducers = {"changes": sum}

    def done(self, stats: dict) -> bool:
        return stats["changes"] == 0


# --------------------------------------------------------------------------
# runner
# --------------------------------------------------------------------------

@dataclass
class RunResult:
    state: DataFrame
    supersteps: int
    converged: bool
    stats_history: list[dict[str, Any]] = field(default_factory=list)
    resumed_from: int = 0


def run_program(
    ctx: GraphContext,
    program,
    max_iter: int = 100,
    ckpt_root: str | None = None,
    resume: bool = True,
    init_state: DataFrame | None = None,
) -> RunResult:
    """Drive a vertex program to convergence (SURVEY.md §2.10 skeleton).

    With ``ckpt_root``: every superstep is durably checkpointed with lineage
    + metrics and the next superstep reads back from parquet; a killed run
    re-invoked with the same root resumes from the latest complete superstep
    (op 53).  Without it, localCheckpoint gives the same plan truncation
    without durability.
    """
    ckpt = None
    if ckpt_root is not None:
        ckpt = CheckpointManager(
            ctx.spark, ckpt_root, program.name, ctx.fingerprint, ctx.P,
            ctx.n_vertices, list(program.state_cols),
        )

    t0 = 0
    state = None
    if ckpt is not None and resume:
        latest = ckpt.latest_complete()
        if latest is not None:
            t0 = latest[0]
            state = ckpt.read_state(t0)

    if state is None:
        state = (
            (init_state if init_state is not None else program.init_state(ctx))
            .repartition(ctx.P, "part_id")
            .localCheckpoint()
        )

    nnz = ctx.nnz_undirected if program.uses_undirected else ctx.nnz_directed + ctx.nnz_hub
    history: list[dict[str, Any]] = []
    converged = False
    carry: dict | None = None
    t = t0
    from pyspark.sql.functions import concat_ws, count, crc32, lit
    from pyspark.sql.functions import sum as fsum

    for t in range(t0 + 1, max_iter + 1):
        tic = time.monotonic()
        ns = program.superstep(ctx, state, carry).persist()
        # ONE job for convergence stats AND the checkpoint's per-partition
        # lineage (rows + checksum): per-partition aggregates, reduced
        # driver-side with the program's reducers (max/sum decompose).
        part_rows = (
            ns.groupBy("part_id")
            .agg(
                count(lit(1)).alias("_rows"),
                fsum(crc32(concat_ws(",", *program.state_cols))).alias("_cksum"),
                *program.stat_exprs(),
            )
            .collect()
        )
        stats: dict[str, Any] = {}
        for name, reducer in program.stat_reducers.items():
            vals = [r[name] for r in part_rows if r[name] is not None]
            stats[name] = reducer(vals) if vals else None
        stats.update({"wall_s": None, "edges_scattered": nnz})
        per_partition = sorted(
            (
                {"part_id": r["part_id"], "rows": r["_rows"], "checksum": int(r["_cksum"] or 0)}
                for r in part_rows
            ),
            key=lambda d: d["part_id"],
        )
        if ckpt is not None:
            ckpt.write(
                t,
                ns.select(*program.state_cols),
                metrics={k: stats[k] for k in stats if k != "wall_s"},
                per_partition=per_partition,
            )
            state = ckpt.read_state(t)
        else:
            state = ns.select(*program.state_cols).localCheckpoint()
        ns.unpersist()
        stats["wall_s"] = time.monotonic() - tic
        stats["superstep"] = t
        history.append(stats)
        carry = stats
        if program.done(stats):
            converged = True
            break
    return RunResult(state, t, converged, history, resumed_from=t0)

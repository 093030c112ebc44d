"""Superstep iteration support: lineage cutting, resumable checkpoints, metrics.

The reference is batch-only (SURVEY.md §2.7); "streaming" in this engine means the
superstep loops that drive BFS / PageRank / connected components. Spark has no
fixpoint operator, so iteration lives on the driver, and two problems must be
handled explicitly (SURVEY.md §4):

1. **Lineage blow-up**: hundreds of supersteps of `union`/`join` build an
   unboundedly deep plan. `Checkpointer.cut` truncates it — either via
   `localCheckpoint` (fast, in-memory) or, when a checkpoint dir is configured,
   by writing the state to Parquet and reading it back.
2. **Resume** (north rule): Parquet checkpoints carry a JSON manifest per
   superstep (superstep number, row count, wall seconds, state path), so a new
   driver can resume any BFS/PageRank run from the last completed superstep.

`SuperstepMetrics` records per-superstep wall time and frontier size and exposes
`supersteps_per_min` — the benchmark unit in BASELINE.json.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SuperstepMetrics:
    name: str = "superstep"
    records: list[dict] = field(default_factory=list)
    _t0: float = field(default_factory=time.monotonic)

    def record(self, superstep: int, rows: int, wall_s: float, **extra) -> None:
        self.records.append(
            {"superstep": superstep, "rows": rows, "wall_s": wall_s, **extra}
        )

    @property
    def total_supersteps(self) -> int:
        return len(self.records)

    @property
    def total_wall_s(self) -> float:
        return sum(r["wall_s"] for r in self.records)

    def supersteps_per_min(self) -> float:
        w = self.total_wall_s
        return 60.0 * self.total_supersteps / w if w > 0 else float("inf")

    def as_dict(self) -> dict:
        return {
            "name": self.name,
            "supersteps": self.total_supersteps,
            "wall_s": round(self.total_wall_s, 3),
            "supersteps_per_min": round(self.supersteps_per_min(), 2),
            "per_superstep": self.records,
        }


class Checkpointer:
    """Cuts DataFrame lineage every ``every`` supersteps; optionally durable.

    With ``checkpoint_dir`` set, state is written to
    ``{dir}/{name}/step={k}/`` as Parquet and a manifest line is appended to
    ``{dir}/{name}/manifest.jsonl`` — the per-partition lineage lives in the
    Parquet footer/partition layout, the logical lineage in the manifest.
    """

    #: every Nth lineage cut goes through a Parquet roundtrip instead of
    #: localCheckpoint. Measured on Spark 4.1.2 (tests/test_checkpoint_
    #: salting.py::test_chained_local_checkpoints_stay_flat): a CHAIN of
    #: localCheckpoints — each checkpointed from the previous one — starts
    #: multiplying its per-cut job cost ~2.5× per link past ~12 links (0.2 s
    #: → 22 s by link 20 on a 7-row table), even though both the logical
    #: plan (LogicalRDD) and rdd.toDebugString stay flat, so the cost is
    #: Spark-internal to the checkpoint chain itself. A Parquet write/read
    #: RESETS the chain (measured flat through 40+ iterations with a reset
    #: every 10). 12 sits just under the onset: short loops (pagerank 10,
    #: cc ~12 supersteps) pay at most one roundtrip, long fixpoints reset
    #: before the multiplier bites (measured: resets at 9/19/29 keep a
    #: 40-link chain at 0.14-0.37 s/cut).
    HARD_EVERY = 12

    def __init__(
        self,
        spark: SparkSession,
        name: str = "state",
        checkpoint_dir: str | None = None,
        every: int = 4,
        hard_every: int | None = None,
    ) -> None:
        self.spark = spark
        self.name = name
        self.dir = checkpoint_dir
        self.every = max(1, every)
        self.hard_every = self.HARD_EVERY if hard_every is None else max(1, hard_every)
        self._last_persisted: DataFrame | None = None
        self._n_cuts = 0
        self._tmpdir: str | None = None

    def _hard_cut(self, df: DataFrame) -> DataFrame:
        """Parquet-roundtrip lineage cut: resets the localCheckpoint chain.

        The cut directory is removed at interpreter exit (round-5 advice:
        long fixpoints otherwise accumulate Parquet copies of the loop state
        for the life of the process). Eager per-cut deletion would be unsafe:
        an accumulator folded through an EARLIER hard cut of the same
        Checkpointer (e.g. msf's forest) may be read lazily after later cuts.
        """
        import atexit
        import shutil
        import tempfile

        if self._tmpdir is None:
            self._tmpdir = tempfile.mkdtemp(prefix=f"ckpt_hard_{self.name}_")
            atexit.register(shutil.rmtree, self._tmpdir, ignore_errors=True)
        path = os.path.join(self._tmpdir, f"cut={self._n_cuts}")
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    # ------------------------------------------------------------------ paths
    def _step_path(self, step: int) -> str:
        return os.path.join(self.dir, self.name, f"step={step}")

    def _manifest_path(self) -> str:
        return os.path.join(self.dir, self.name, "manifest.jsonl")

    # ------------------------------------------------------------------ cut
    def cut(self, df: DataFrame, superstep: int, rows: int | None = None,
            wall_s: float | None = None, force: bool = False) -> DataFrame:
        """Return ``df`` with truncated lineage (and durable state if configured)."""
        if superstep % self.every != 0 and not force:
            return df
        if self.dir is None:
            return df.localCheckpoint(eager=True)
        path = self._step_path(superstep)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        os.makedirs(os.path.dirname(self._manifest_path()), exist_ok=True)
        with open(self._manifest_path(), "a") as f:
            f.write(
                json.dumps(
                    {
                        "superstep": superstep,
                        "path": path,
                        "rows": rows,
                        "wall_s": wall_s,
                        "ts": time.time(),
                    }
                )
                + "\n"
            )
        return out

    def step(self, df: DataFrame, superstep: int, rows: int | None = None,
             wall_s: float | None = None, lazy: bool = False) -> DataFrame:
        """Per-superstep state handover: durable cut on the cadence, eager
        localCheckpoint otherwise — state lineage is truncated EVERY superstep
        either way (the idiom every iterative operator needs), so plans stay
        O(1)-deep between durable cuts too.

        ``lazy=True`` returns a NON-eager localCheckpoint: the caller's next
        action (typically the convergence aggregate every fixpoint loop runs
        anyway) both computes the superstep AND materializes the checkpoint —
        one Spark job per superstep instead of two. Only valid when the
        caller immediately runs an action that touches every partition (a
        global aggregate does); durable cuts ignore it (the Parquet write is
        the materialization).

        Every ``hard_every``-th cut is a Parquet roundtrip regardless of
        cadence or laziness — chained localCheckpoints accumulate
        Spark-internal per-cut cost past ~12 links (see HARD_EVERY) and the
        roundtrip resets the chain."""
        self._n_cuts += 1
        if self._n_cuts % self.hard_every == 0 and self.dir is None:
            return self._hard_cut(df)
        if superstep % self.every != 0 or self.dir is None:
            return df.localCheckpoint(eager=not lazy)
        return self.cut(df, superstep, rows=rows, wall_s=wall_s)

    # ------------------------------------------------------------------ resume
    def latest(self) -> tuple[DataFrame, int] | None:
        """(state, superstep) of the last durable checkpoint, or None."""
        if self.dir is None:
            return None
        mp = self._manifest_path()
        if not os.path.exists(mp):
            return None
        last = None
        with open(mp) as f:
            for line in f:
                line = line.strip()
                if line:
                    last = json.loads(line)
        if last is None:
            return None
        return self.spark.read.parquet(last["path"]), int(last["superstep"])


#: per-session stack of saved AQE values — makes nested scopes restore in LIFO
#: order (an inner aqe_enabled inside an outer aqe_disabled puts the outer
#: "false" back on exit, and the outer scope then restores the session value).
#: Concurrent loops on ONE session remain session-global — documented limit.
_AQE_STACK: dict[int, list[str]] = {}


@contextmanager
def _aqe_scope(spark: SparkSession, value: str):
    key = "spark.sql.adaptive.enabled"
    stack = _AQE_STACK.setdefault(id(spark), [])
    try:
        old = spark.conf.get(key)
    except Exception:
        old = "true"
    stack.append(old)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, stack.pop())


def aqe_disabled(spark: SparkSession):
    """Disable adaptive query execution for a superstep loop, restoring the
    entry setting on exit (re-entrant: nested scopes restore LIFO).

    Iterative fixpoints here are fixed-shape plans over small keyed state —
    AQE has nothing to re-plan but still pays per-superstep query-stage
    scheduling and re-optimization (measured: PageRank 10 iterations at sf0.1
    ≈ 17 s first run with AQE vs ≈ 12 s without). Standard guidance for
    Pregel-style loops. NOTE: session-global while held — queries launched
    concurrently on the same session during the loop also run without AQE.
    """
    return _aqe_scope(spark, "false")


def aqe_enabled(spark: SparkSession):
    """Force-enable AQE for a scope (re-entrant, LIFO restore) — used by
    pointer-jump supersteps whose label self-join measurably benefits from
    adaptive broadcast/coalesce (see ``components.connected_components``:
    10k-chain ≈ 6 s with AQE vs ≈ 15 s without)."""
    return _aqe_scope(spark, "true")


#: same LIFO-stack discipline as _AQE_STACK, keyed by (session, conf key)
_CONF_STACKS: dict[tuple[int, str], list[str | None]] = {}


@contextmanager
def _conf_scope(spark: SparkSession, key: str, value: str):
    stack = _CONF_STACKS.setdefault((id(spark), key), [])
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    stack.append(old)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        prev = stack.pop()
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def broadcast_joins_disabled(spark: SparkSession):
    """Scope ``spark.sql.autoBroadcastJoinThreshold`` to -1 (LIFO restore).

    For NARROW fixpoint loops (scoped shuffle width ≤ 8) the per-superstep
    join sides are small co-partitioned state tables: a broadcast hash join
    re-ships the label table every superstep AND submits one extra Spark job
    per superstep for the broadcast exchange (measured: cc 10k-chain drops
    from 2 jobs/superstep to 1 with broadcasts off, equal-or-better wall),
    while the sort-merge join over the already co-partitioned sides is
    exchange-free. Explicit ``F.broadcast()`` hints are unaffected.
    """
    return _conf_scope(spark, "spark.sql.autoBroadcastJoinThreshold", "-1")


def fixpoint_width(
    spark: SparkSession, rows: int, per_partition: int = 64_000, floor: int = 2
) -> int:
    """The loop shuffle width :func:`fixpoint_shuffle_partitions` would scope
    to — exposed so loops can hash-partition their loop-carried edge tables to
    the SAME width up front (join sides then co-partition and the edge table
    never re-exchanges per superstep, guide §2.4).

    ``floor=2`` (was 4): for 10k-row showcase states the narrower exchanges
    measurably win (10k-cycle SCC 32.3 s → 24.2 s at floor 2, 21.8 at 1;
    10k-chain CC 5.9 → 5.1) while the sf0.1 graph kernels are flat within
    noise across floors 1/2/4 (cc 5.3–5.5, pagerank 5.8–6.3 warm) — the
    floor only binds when ceil(rows/per_partition) is tiny, i.e. when the
    state genuinely fits a couple of partitions; real widths still derive
    from the data volume, so cluster-scale runs are untouched."""
    cur = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    target = max(floor, -(-int(rows) // per_partition))
    return min(cur, target)


def fixpoint_shuffle_partitions(
    spark: SparkSession, rows: int, per_partition: int = 64_000, floor: int = 2
):
    """Scope ``spark.sql.shuffle.partitions`` to the fixpoint's per-superstep
    exchange volume (``rows`` ≈ max(|V|, |E|) of the loop's state and
    contribution streams), restoring the session value on exit.

    A superstep over 10k-row state with the session's 32 shuffle partitions
    pays 32-task scheduling per exchange for partitions holding ~300 rows
    each — measured 5.1 s → 3.7 s on the 10k-chain CC showcase just from
    sizing this down. The count never EXCEEDS the session setting, so large
    graphs (where the session default reflects cluster capacity) are
    untouched — this is the small-state tail of the standard "size your
    shuffle to your data" rule, the regime AQE coalescing only partially
    recovers (AQE still schedules its initial map tasks at the session
    width).

    ``per_partition`` is tuned from a two-scale pagerank sweep (local[32],
    sf0.1 eg graph ≈ 105k edges and a 10×-replicated copy ≈ 1.05 M edges):
    1× optimum is width 4–8 (6.2–7.7 s vs 14–15.4 s at the session's 32),
    10× optimum is width 16 (≈10.1 s vs ≈12.1 s at width 5 and ≈16.5 s at
    32). 64k rows/partition lands on both optima — ceil(105k/64k)→2,
    ceil(1.05M/64k)=17 — where the previous 250k sizing under-widthed the
    10× case by ~20%.
    """
    return _conf_scope(
        spark,
        "spark.sql.shuffle.partitions",
        str(fixpoint_width(spark, rows, per_partition, floor)),
    )


@contextmanager
def adaptive_shuffle_width(
    spark: SparkSession, per_partition: int = 64_000, floor: int = 2
):
    """Frontier-driven variant of :func:`fixpoint_shuffle_partitions` for
    loops whose exchange volume VARIES superstep to superstep (BFS frontiers,
    Brandes lockstep sweeps): yields an ``update(rows)`` callable the loop
    invokes with its estimate of the NEXT superstep's exchange rows (typically
    ``max(|visited|, |frontier| · avg_degree)`` — both already counted every
    superstep for convergence), re-sizing ``spark.sql.shuffle.partitions``
    between supersteps. Spark re-plans each superstep's DataFrames lazily, so
    a conf change between actions takes effect on the next superstep's jobs.

    The width never exceeds the session value captured at entry (large
    frontiers keep full cluster parallelism; the session value is restored on
    exit), so this only trims the small-frontier tail — the BFS ramp-up/
    drain-out supersteps and small-reach seed sets that otherwise pay
    session-width task scheduling per exchange for near-empty partitions.
    """
    cur = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    def update(rows: int) -> None:
        target = max(floor, -(-int(rows) // per_partition))
        spark.conf.set("spark.sql.shuffle.partitions", str(min(cur, target)))

    with _conf_scope(spark, "spark.sql.shuffle.partitions", str(cur)):
        yield update

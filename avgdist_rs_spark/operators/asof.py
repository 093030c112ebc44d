"""As-of (point-in-time) join — attach to each left row the latest right row
at or before its timestamp, per key.

The canonical event-enrichment operator Spark lacks as a built-in (pandas has
``merge_asof``; kdb/QuestDB/Flink each ship one). A naive range join
(``l.ts >= r.ts``) explodes to O(|L|·|R|) candidates per key before taking
the max; the scalable formulation here is the UNION-SORT carry-forward:

1. union both sides with a side tag (right = 0, left = 1),
2. one window per key ordered by (ts, tag, id) — right rows sort before
   left rows at equal timestamps, so the join is INCLUSIVE (a right row at
   exactly ``l.ts`` matches),
3. ``last(value, ignorenulls=True)`` over rows unbounded-preceding..current
   carries each right row's payload forward to every later left row.

One shuffle on the key, no candidate blow-up, per-key state = a single
carried row. Cost is the per-key sort — the same exchange a range join would
need anyway, minus the join explosion. A mega-key is a sequential prefix
scan (carry-forward does not salt the way pure aggregation does); at
transcript scale keys are conversations/users, whose per-key row counts are
bounded, and a pathological key should be windowed by coarse time first
(documented, not speculatively built).

``tolerance`` bounds the lookback: a match older than ``tolerance`` seconds
is nulled out (pandas ``merge_asof(tolerance=...)`` semantics), applied as a
post-projection — the scan shape is unchanged.

The DuckDB oracle deliberately uses a DIFFERENT algorithm (LEFT JOIN LATERAL
``ORDER BY ts DESC LIMIT 1``) so implementation and oracle share no code
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    id_col: str = "event_id",
    payload: tuple[str, ...] = ("value",),
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row: the latest right row with ``r.ts <= l.ts`` on the
    same ``on`` key (ties broken by largest ``id_col``). Returns every left
    row with ``asof_<id_col>``, ``asof_<payload...>`` and ``lag_s`` (whole
    seconds between the two rows; all NULL when no right row qualifies).
    """
    lcols = left.columns
    # internal working columns are reserved: a silent collision would corrupt
    # the unionByName/window (round-5 advice — fail loudly instead)
    reserved = {"_tag", "_rts", "_rid", "_ats", "_aid"}
    reserved |= {f"_rp_{c}" for c in payload} | {f"_ap_{c}" for c in payload}
    clash = reserved.intersection(lcols)
    if clash:
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with reserved "
            "internal names — rename them before joining"
        )
    out_names = {f"asof_{id_col}", *[f"asof_{c}" for c in payload], "lag_s"}
    out_clash = out_names.intersection(lcols)
    if out_clash:
        raise ValueError(
            f"asof_join: left columns {sorted(out_clash)} collide with output "
            "column names — rename them before joining"
        )
    r = right.select(
        F.col(on),
        F.col(ts).alias("_rts"),
        F.col(id_col).alias("_rid"),
        *[F.col(c).alias(f"_rp_{c}") for c in payload],
    )
    tagged = left.select(
        *lcols,
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_rts"].dataType).alias("_rts"),
        F.lit(None).cast(r.schema["_rid"].dataType).alias("_rid"),
        *[F.lit(None).cast(r.schema[f"_rp_{c}"].dataType).alias(f"_rp_{c}") for c in payload],
    ).unionByName(
        r.select(
            F.col(on),
            F.lit(0).alias("_tag"),
            "_rts",
            "_rid",
            *[f"_rp_{c}" for c in payload],
        ),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.coalesce(F.col(ts), F.col("_rts")),
            F.col("_tag"),
            F.coalesce(F.col(id_col), F.col("_rid")),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        *lcols,
        "_tag",
        F.last("_rts", ignorenulls=True).over(w).alias("_ats"),
        F.last("_rid", ignorenulls=True).over(w).alias("_aid"),
        *[
            F.last(f"_rp_{c}", ignorenulls=True).over(w).alias(f"_ap_{c}")
            for c in payload
        ],
    ).where(F.col("_tag") == 1)
    lag = F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.col("_ats"))
    stale = (
        F.lit(False) if tolerance is None else (lag > F.lit(int(tolerance)))
    )
    keep = F.col("_aid").isNotNull() & ~stale
    return carried.select(
        *lcols,
        F.when(keep, F.col("_aid")).alias(f"asof_{id_col}"),
        *[F.when(keep, F.col(f"_ap_{c}")).alias(f"asof_{c}") for c in payload],
        F.when(keep, lag).alias("lag_s"),
    )

"""Custom stateful streaming operators via applyInPandasWithState.

For semantics the built-in windowed aggregations can't express — running
per-key accumulators that must survive across micro-batches and emit on
every update — Structured Streaming's arbitrary-state API is the tool:
state lives in the state store (checkpointed, partitioned by key), the
user function sees Arrow batches per key, and watermark-based timeouts
garbage-collect idle keys so state stays bounded.

Here: a per-user running profile (event count, value sum, exponential
moving average of value) — the "feature-store maintenance" shape of a
training-data pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("ema_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)

_EMA_ALPHA = 0.125


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, ema = state.get
    else:
        n, total, ema = 0, 0.0, None
    # deterministic fold: events within the micro-batch are processed in
    # event-time order so the EMA does not depend on batch slicing
    rows = pd.concat(list(batches)).sort_values("ts")
    for v in rows["value"]:
        n += 1
        total += float(v)
        ema = float(v) if ema is None else (_EMA_ALPHA * float(v) + (1 - _EMA_ALPHA) * ema)
    state.update((n, total, ema))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "ema_value": [ema],
        }
    )


def user_profiles_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user running profile, one output row per user
    per micro-batch touching that user."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

from pyspark.sql.types import StringType

TYPE_STATS_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def has_transform_with_state() -> bool:
    """transformWithStateInPandas needs a working google.protobuf (its
    driver worker speaks protobuf to the JVM); absent/broken installs
    crash the streaming runner, so callers gate on this."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def type_stats_stream(events: DataFrame) -> DataFrame:
    """Running per-event-type stats via ``transformWithStateInPandas`` —
    the Spark 4 successor to applyInPandasWithState: typed state handles
    (ValueState here; List/MapState for richer shapes), timers, and
    state-store-backed durability per key.  Emits the updated running
    (count, sum, max) for each type on every micro-batch.

    Reference analogue: none — the reference is batch-only (SURVEY
    §2.10), this is part of the streaming surface a Spark engine owes.
    Requires a working protobuf runtime (see has_transform_with_state);
    environments without it use user_profiles_stream's
    applyInPandasWithState path instead.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("mx", DoubleType()),
        ]
    )

    class TypeStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total, mx = 0, 0.0, float("-inf")
            if self._agg.exists():
                n, total, mx = self._agg.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._agg.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .transformWithStateInPandas(
            TypeStats(),
            outputStructType=TYPE_STATS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Debounce / burst-collapse (streaming twin of q134)
# ---------------------------------------------------------------------------

DEBOUNCE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
    ]
)

_DEBOUNCE_STATE = StructType([StructField("last_us", LongType())])


def debounce_stream(events: DataFrame, gap_s: int = 300) -> DataFrame:
    """Streaming burst-collapse: emit an event only if ≥ ``gap_s`` passed
    since the PREVIOUS event of the same (user, event_type) — the exact
    lag semantics of the q134 batch query (state tracks the last *seen*
    event time, kept or not), so per-micro-batch output over an
    in-order feed unions to the batch answer.

    State per key is one integer (microseconds of the last event) in the
    partitioned, checkpointed state store; within a micro-batch events
    fold in (ts, event_id) order so output is independent of batch
    slicing.  Keys idle past retention would be GC'd by a timeout in a
    production deployment; NoTimeout keeps the twin-equivalence test
    exact."""
    gap_us = gap_s * 1_000_000

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id, event_type = key
        last = state.get[0] if state.exists else None
        rows = pd.concat(list(batches)).sort_values(["ts", "event_id"])
        kept = []
        for eid, ts in zip(rows["event_id"], rows["ts"]):
            us = pd.Timestamp(ts).value // 1000
            if last is None or us - last >= gap_us:
                kept.append(eid)
            last = us
        state.update((int(last),))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(kept),
                "event_type": [event_type] * len(kept),
                "event_id": kept,
            }
        )

    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            update,
            outputStructType=DEBOUNCE_SCHEMA,
            stateStructType=_DEBOUNCE_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

# last up to 6 values, newest first; nullable doubles instead of an array
# keep the state schema flat for the state store
_EWMA_STATE = StructType(
    [StructField(f"r{k}", DoubleType()) for k in range(1, 7)]
)


def _round6_half_away(x: float) -> float:
    """Replicate Spark/DuckDB round(x, 6) (HALF-AWAY-FROM-ZERO) — Python's
    round() is half-even and WILL eventually diverge (CLAUDE.md rule)."""
    import math

    return (
        math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else math.ceil(x * 1e6 - 0.5) / 1e6
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the q155 truncated EWMA: per-user state holds
    the previous (up to) 6 values; each arriving event emits the
    7-term renormalized exponential average of (current, lags...).

    The fold replays the batch query's exact arithmetic — same term
    order (weights 0.5^k accumulated left to right), same NULL-lag
    renormalization, same half-away-from-zero 6-dp round — so the
    per-micro-batch output over an in-order feed equals the batch
    answer row for row.  State per key is six doubles in the
    partitioned, checkpointed state store; within a micro-batch rows
    fold in (ts, event_id) order so output is independent of batch
    slicing."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        recent: list = list(state.get) if state.exists else [None] * 6
        rows = pd.concat(list(batches)).sort_values(["ts", "event_id"])
        out_ids, out_vals = [], []
        for eid, v in zip(rows["event_id"], rows["value"]):
            v = None if pd.isna(v) else float(v)
            num, den = 0.0, 0.0
            for k in range(7):
                lk = v if k == 0 else recent[k - 1]
                if lk is not None:
                    num = num + (0.5**k) * lk
                    den = den + 0.5**k
                else:
                    num = num + 0.0
                    den = den + 0.0
            out_ids.append(eid)
            out_vals.append(_round6_half_away(num / den) if den > 0 else None)
            recent = [v] + recent[:5]
        state.update(tuple(recent))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_ids),
                "event_id": out_ids,
                "ewma": out_vals,
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=EWMA_SCHEMA,
            stateStructType=_EWMA_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PACK_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", LongType()),
        StructField("bin_id", LongType()),
        StructField("fill_after", LongType()),
    ]
)

_PACK_SHELF = 8  # open bins kept per key; oldest closes on overflow

# flat state: next bin id, then (bin_id, fill) per shelf slot (-1 = empty)
_PACK_STATE = StructType(
    [StructField("next_bin", LongType())]
    + [
        StructField(f"{p}{i}", LongType())
        for i in range(_PACK_SHELF)
        for p in ("bid", "fill")
    ]
)


def pack_stream(docs: DataFrame, capacity: int = 512) -> DataFrame:
    """Streaming FIRST-FIT sequence packing — the inherently sequential
    packing variant q160's batch concat-and-chunk deliberately avoids:
    each arriving document (per source, in doc_id order within a
    micro-batch) is placed into the first open bin it fits, else opens
    a new bin.  State per key is a bounded SHELF of the 8 most recent
    open bins (a bin that falls off the shelf is closed — the
    bounded-state discipline every stateful operator here follows), so
    state is O(1) per key no matter how many documents stream through.

    Documents at or above ``capacity`` get a bin of their own and are
    never shelved.  Emits (source, doc_id, bin_id, fill_after); bin ids
    are a per-key running counter, so output is deterministic for a
    fixed arrival order (the twin test replays the same order through a
    driver-side reference)."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            st = list(state.get)
            next_bin = st[0]
            shelf = [
                [st[1 + 2 * i], st[2 + 2 * i]]
                for i in range(_PACK_SHELF)
                if st[1 + 2 * i] >= 0
            ]
        else:
            next_bin, shelf = 0, []
        rows = pd.concat(list(batches)).sort_values("doc_id")
        out_ids, out_bins, out_fills = [], [], []
        for did, n in zip(rows["doc_id"], rows["n_tokens"]):
            n = int(n)
            placed = None
            if n < capacity:
                for slot in shelf:
                    if slot[1] + n <= capacity:
                        slot[1] += n
                        placed = slot
                        break
            if placed is None:
                placed = [next_bin, n]
                next_bin += 1
                if n < capacity:  # full-or-over bins are born closed
                    shelf.append(placed)
                    if len(shelf) > _PACK_SHELF:
                        shelf.pop(0)  # oldest open bin closes
            if placed[1] >= capacity and placed in shelf:
                shelf.remove(placed)  # exactly full: nothing more fits
            out_ids.append(int(did))
            out_bins.append(placed[0])
            out_fills.append(placed[1])
        flat = [next_bin]
        for i in range(_PACK_SHELF):
            flat += shelf[i] if i < len(shelf) else [-1, -1]
        state.update(tuple(flat))
        yield pd.DataFrame(
            {
                "source": [source] * len(out_ids),
                "doc_id": out_ids,
                "bin_id": out_bins,
                "fill_after": out_fills,
            }
        )

    return (
        docs.select("source", "doc_id", "n_tokens")
        .groupBy("source")
        .applyInPandasWithState(
            update,
            outputStructType=PACK_SCHEMA,
            stateStructType=_PACK_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


WSAMPLE_K = 10

WSAMPLE_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("gen", LongType()),
        StructField("rank", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)

def _wsample_state(k: int) -> StructType:
    """Flat state: generation counter + k reservoir slots (key,
    event_id, value) — built PER k so a non-default reservoir size gets
    a matching state schema (a fixed 10-slot schema made every other k
    crash at state.update; review r7)."""
    return StructType(
        [StructField("gen", LongType())]
        + [
            StructField(f"{p}{i}", t())
            for i in range(k)
            for p, t in (("k", DoubleType), ("eid", LongType), ("val", DoubleType))
        ]
    )


def weighted_sample_stream(events: DataFrame, k: int = WSAMPLE_K) -> DataFrame:
    """Streaming weighted sampling without replacement — the
    Efraimidis–Spirakis reservoir twin of q168 over an unbounded feed:
    per event type the state holds the k largest ln(u)/w keys seen so
    far (u = md5-derived uniform per event id, w = the event's value),
    and each micro-batch emits the UPDATED reservoir with a generation
    counter so consumers (and the test) can take the latest snapshot.

    Top-k-by-key is an associative, commutative merge, so the reservoir
    after any batch slicing equals the batch query over the same prefix
    — the property the cross-trigger test pins.  State per key is
    exactly k (key, id, value) triples — O(k) regardless of stream
    length; rows with non-positive weight carry no mass and are
    skipped."""
    import hashlib
    import math

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            st = list(state.get)
            gen = st[0]
            slots = [
                (st[1 + 3 * i], st[2 + 3 * i], st[3 + 3 * i])
                for i in range(k)
                if st[2 + 3 * i] is not None
            ]
        else:
            gen, slots = 0, []
        for pdf in batches:
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                if pd.isna(v) or float(v) <= 0:
                    continue
                eid = int(eid)
                u = int(
                    hashlib.md5(str(eid).encode()).hexdigest()[:13], 16
                ) / float(1 << 52)
                kk = math.log(u) / float(v) if u > 0 else float("-inf")
                slots.append((kk, eid, float(v)))
        slots.sort(key=lambda t: (-t[0], t[1]))
        slots = slots[:k]
        gen += 1
        flat = [gen]
        for i in range(k):
            if i < len(slots):
                flat += [slots[i][0], slots[i][1], slots[i][2]]
            else:
                flat += [None, None, None]
        state.update(tuple(flat))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(slots),
                "gen": [gen] * len(slots),
                "rank": list(range(1, len(slots) + 1)),
                "event_id": [s[1] for s in slots],
                "value": [s[2] for s in slots],
            }
        )

    return (
        events.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=WSAMPLE_SCHEMA,
            stateStructType=_wsample_state(k),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


MGSTREAM_K = 20
MGSTREAM_SHARDS = 4

MGSTREAM_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("gen", LongType()),
        StructField("n_seen", LongType()),
        StructField("item", StringType()),
        StructField("cnt", LongType()),
    ]
)


def _mg_state(k: int) -> StructType:
    fields = [StructField("gen", LongType()), StructField("n_seen", LongType())]
    for i in range(k):
        fields.append(StructField(f"item_{i}", StringType()))
        fields.append(StructField(f"cnt_{i}", LongType()))
    return StructType(fields)


def heavy_hitter_stream(
    items: DataFrame, k: int = MGSTREAM_K, shards: int = MGSTREAM_SHARDS
) -> DataFrame:
    """Streaming heavy-hitter candidates — the unbounded-feed twin of the
    batch Misra–Gries kernel (operators/heavyhitters.py, q181): per
    SHARD (md5(item) mod ``shards`` — every occurrence of an item lands
    in one shard, so per-shard bounds are global bounds) the state holds
    a k-counter MG summary merged batch-by-batch with the same
    mergeable-summaries trim the batch kernel uses.  Emits the updated
    summary per trigger with a generation counter and the shard's total
    row count, so a consumer can read off the published MG guarantees:
    every item with true frequency > n_seen/(k+1) is present, and a
    present item's count is within n_seen/(k+1) below its true
    frequency (the self-calibrating bound the twin test pins).

    State per shard is exactly k (item, cnt) slots — O(k·shards)
    total regardless of stream length.  The per-batch merge goes through
    value_counts first, so the result is independent of row order
    WITHIN a micro-batch (only the batch slicing matters, which is what
    lets a driver-side replay reproduce the stream bit-for-bit)."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            st = list(state.get)
            gen, n_seen = st[0], st[1]
            counters = {
                st[2 + 2 * i]: st[3 + 2 * i]
                for i in range(k)
                if st[2 + 2 * i] is not None
            }
        else:
            gen, n_seen, counters = 0, 0, {}
        # accumulate ALL the trigger's chunks first, trim ONCE: Arrow
        # hands the micro-batch to this function in ~10k-row chunks
        # (arrow.maxRecordsPerBatch), and a per-chunk trim would make
        # the result depend on that invisible chunking — one trim per
        # micro-batch keeps the summary a pure function of the batch
        # slicing, which is what the driver-replay twin test models.
        # Interim memory is bounded by the trigger's distinct items,
        # the same bound the replay itself needs.
        for pdf in batches:
            n_seen += len(pdf)
            for item, c in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
        if len(counters) > k:
            cut = sorted(counters.values(), reverse=True)[k]
            counters = {i: c - cut for i, c in counters.items() if c - cut > 0}
        gen += 1
        # deterministic slot order: count desc, item asc
        slots = sorted(counters.items(), key=lambda t: (-t[1], t[0]))[:k]
        flat = [gen, n_seen]
        for i in range(k):
            flat += list(slots[i]) if i < len(slots) else [None, None]
        state.update(tuple(flat))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(slots),
                "gen": [gen] * len(slots),
                "n_seen": [n_seen] * len(slots),
                "item": [s[0] for s in slots],
                "cnt": [s[1] for s in slots],
            }
        )

    sharded = items.withColumn(
        "shard",
        F.conv(F.substring(F.md5("item"), 1, 8), 16, 10).cast("long") % shards,
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=MGSTREAM_SCHEMA,
        stateStructType=_mg_state(k),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CDC_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("gen", LongType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("v", DoubleType()),
    ]
)

_CDC_STATE = StructType(
    [
        StructField("gen", LongType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("v", DoubleType()),
    ]
)


def cdc_apply_stream(changes: DataFrame) -> DataFrame:
    """Streaming CDC APPLY — the unbounded twin of q180's batch
    latest-op-wins collapse: per key the state is ONE (seq, op, v)
    triple (the highest sequence number seen so far, across any batch
    slicing), updated as changes stream in and emitted per trigger with
    a generation counter.  A consumer materializes the table as "latest
    emission per key where op != 'D'" — exactly the batch query's
    answer over the same prefix, which is what the twin test pins.

    State per key is O(1) forever (the key's history is never kept);
    out-of-order arrivals are handled by the max-seq comparison, so the
    result is independent of how the feed is sliced into micro-batches.

    ``changes``: (k long, seq long, op string, v double)."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            gen, seq, op, v = state.get
        else:
            gen, seq, op, v = 0, None, None, None
        for pdf in batches:
            if len(pdf) == 0:  # empty trailing Arrow chunk
                continue
            i = pdf["seq"].idxmax()  # (k, seq) unique: one winner per chunk
            bseq = int(pdf["seq"][i])
            if seq is None or bseq > seq:
                seq, op, v = bseq, str(pdf["op"][i]), float(pdf["v"][i])
        gen += 1
        state.update((gen, seq, op, v))
        yield pd.DataFrame(
            {"k": [k], "gen": [gen], "seq": [seq], "op": [op], "v": [v]}
        )

    return changes.groupBy("k").applyInPandasWithState(
        update,
        outputStructType=CDC_SCHEMA,
        stateStructType=_CDC_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CMS_STREAM_SCHEMA = StructType(
    [
        StructField("r", LongType()),
        StructField("gen", LongType()),
        StructField("b", LongType()),
        StructField("c", LongType()),
    ]
)


def _cms_state() -> StructType:
    # the array field is unbounded in the SCHEMA — width is enforced by
    # the update function, not here (a width parameter would imply a
    # checkpoint-compatibility check this struct cannot perform)
    from pyspark.sql.types import ArrayType

    return StructType(
        [
            StructField("gen", LongType()),
            StructField("counts", ArrayType(LongType())),
        ]
    )


def cms_stream(items: DataFrame, width: int = 128, depth: int = 3) -> DataFrame:
    """Streaming count-min — the unbounded-feed twin of the batch kernel
    (operators/countmin.cms_sketch): each input item fans out to the
    ``depth`` hash rows; state per row r is the width-long counter
    array, advanced once per micro-batch.  Emits the row's nonzero cells
    every trigger with a generation counter.

    Because the update is pure integer addition, the snapshot after any
    trigger equals the batch sketch of everything fed so far — not just
    under the replayed slicing but under ANY slicing (stronger than the
    MG twin, whose trim is slicing-dependent).  State is exactly
    depth * width longs, O(1) in stream length."""
    import numpy as np

    from ..operators.countmin import bucket_py

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (r,) = key
        if state.exists:
            gen, counts = state.get
            acc = np.asarray(counts, dtype=np.int64)
        else:
            gen, acc = 0, np.zeros(width, dtype=np.int64)
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                acc[bucket_py(int(r), item, width)] += int(c)
        gen += 1
        state.update((gen, [int(x) for x in acc]))
        nz = np.nonzero(acc)[0]
        yield pd.DataFrame(
            {
                "r": np.full(len(nz), r, dtype=np.int64),
                "gen": np.full(len(nz), gen, dtype=np.int64),
                "b": nz.astype(np.int64),
                "c": acc[nz],
            }
        )

    fanout = items.select(
        F.explode(F.array(*[F.lit(r).cast("long") for r in range(depth)])).alias(
            "r"
        ),
        F.col("item").cast("string").alias("item"),
    )
    return fanout.groupBy("r").applyInPandasWithState(
        update,
        outputStructType=CMS_STREAM_SCHEMA,
        stateStructType=_cms_state(),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HOLT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", StringType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast_next", DoubleType()),
    ]
)

# (days seen, first value while uninitialized, level, trend)
_HOLT_STATE = StructType(
    [
        StructField("cnt", LongType()),
        StructField("x0", DoubleType()),
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
    ]
)


def holt_stream(daily: DataFrame, alpha: float = 0.5, beta: float = 0.5) -> DataFrame:
    """Streaming twin of q248's Holt linear-trend smoother, per event
    type: consumes an in-order DAILY-AGGREGATE feed (event_type, day, x)
    and maintains (level, trend) across micro-batches, emitting the
    state and one-step-ahead forecast after each day.

    The recurrence replays operators/forecast.holt_linear_forecast's
    exact float expression tree (alpha*x + (1-alpha)*(l+b); beta*(l'-l)
    + (1-beta)*b), so after any prefix of the series the streaming state
    equals the batch kernel's state over the same prefix — the twin-test
    contract.  Init needs two observations (l = x1, b = x2 - x1); the
    first day emits no forecast (NULL trend).  State per key is four
    numbers; rows fold in day order within a micro-batch, so output is
    independent of batch slicing for an in-order feed."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        cnt, x0, lvl, trd = state.get if state.exists else (0, None, None, None)
        rows = pd.concat(list(batches)).sort_values("day")
        days, lvls, trds, fcs = [], [], [], []
        for day, x in zip(rows["day"], rows["x"]):
            x = float(x)
            if cnt == 0:
                x0, cnt = x, 1
                days.append(str(day)); lvls.append(x); trds.append(None)
                fcs.append(None)
                continue
            if cnt == 1:
                lvl, trd, cnt = x0, x - x0, 2
                # replay the t=2 recurrence step exactly as the kernel
                new_l = alpha * x + (1.0 - alpha) * (lvl + trd)
                trd = beta * (new_l - lvl) + (1.0 - beta) * trd
                lvl = new_l
            else:
                cnt += 1
                new_l = alpha * x + (1.0 - alpha) * (lvl + trd)
                trd = beta * (new_l - lvl) + (1.0 - beta) * trd
                lvl = new_l
            days.append(str(day)); lvls.append(lvl); trds.append(trd)
            fcs.append(lvl + trd)
        state.update((cnt, x0, lvl, trd))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(days),
                "day": days,
                "level": lvls,
                "trend": trds,
                "forecast_next": fcs,
            }
        )

    return daily.select("event_type", "day", "x").groupBy(
        "event_type"
    ).applyInPandasWithState(
        update,
        outputStructType=HOLT_SCHEMA,
        stateStructType=_HOLT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DECAY_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", StringType()),
        StructField("decayed_count", DoubleType()),
    ]
)

_DECAY_STATE = StructType(
    [
        StructField("last_day", StringType()),
        StructField("counts", ArrayType(LongType())),
    ]
)

_DECAY_WINDOW = 46  # ages 0..45 contribute >= one 2^-45 unit


def decayed_counter_stream(daily: DataFrame) -> DataFrame:
    """Streaming twin of q274's exponentially-decayed leaderboard, per
    event type: consumes an in-order DAILY-AGGREGATE feed
    (event_type, day, cnt) and maintains the trailing-46-day count
    buffer across micro-batches, emitting the decayed total after each
    day.

    Exactness contract (the q274 dyadic rule): state holds RAW daily
    counts, never a pre-decayed float — a decayed running value would
    lose low bits on every shift, diverging from the batch formula.
    The emitted value recomputes Σ cnt_age · 2^(45−age) as an exact
    Python big-int and converts once (correctly rounded), so after any
    in-order prefix the stream equals the batch aggregate over the same
    prefix — the twin-test contract.  Days older than 45 fall off the
    buffer exactly as the batch query's age filter drops them.  State
    per key is 46 longs; rows fold in day order within a micro-batch
    (one concat per micro-batch, the r7 reduction rule).

    Out-of-order days ACROSS micro-batches (r8 advice fix — they were
    silently folded into the age-0 bucket, corrupting the total) merge
    into their TRUE age bucket relative to the frontier (counts[age]),
    or contribute nothing when older than the 46-day buffer — exactly
    what the batch formula assigns them — and their emitted row carries
    the FRONTIER day (the as-of day of the updated total), so the
    stream still equals the batch aggregate over the same multiset of
    fed days regardless of cross-batch day order."""
    from datetime import date

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            last_day, counts = state.get
            counts = list(counts)
        else:
            last_day, counts = None, [0] * _DECAY_WINDOW
        rows = pd.concat(list(batches)).sort_values("day")
        days, vals = [], []
        for day, c in zip(rows["day"], rows["cnt"]):
            day = str(day)
            if last_day is None:
                counts[0] = int(c)
            else:
                delta = (date.fromisoformat(day) - date.fromisoformat(last_day)).days
                if delta == 0:
                    # same-day aggregate arriving split across batches
                    counts[0] += int(c)
                elif delta < 0:
                    # late day from an earlier micro-batch: merge into
                    # its TRUE age bucket (or age out entirely), and
                    # emit the updated total as of the frontier day
                    if -delta < _DECAY_WINDOW:
                        counts[-delta] += int(c)
                    day = last_day
                else:
                    counts = ([0] * min(delta, _DECAY_WINDOW) + counts)[
                        :_DECAY_WINDOW
                    ]
                    counts[0] = int(c)
            last_day = max(last_day, day) if last_day else day
            units = sum(
                counts[i] << (_DECAY_WINDOW - 1 - i)
                for i in range(_DECAY_WINDOW)
            )
            days.append(day)
            vals.append(float(units) / 35184372088832.0)
        state.update((last_day, counts))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(days),
                "day": days,
                "decayed_count": vals,
            }
        )

    return daily.select("event_type", "day", "cnt").groupBy(
        "event_type"
    ).applyInPandasWithState(
        update,
        outputStructType=DECAY_SCHEMA,
        stateStructType=_DECAY_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("registers_hit", LongType()),
        StructField("hll_estimate", DoubleType()),
    ]
)

_HLL_STATE = StructType(
    [StructField("regs", ArrayType(LongType()))]
)

_HLL_M = 256  # registers; q312/q173's md5 sketch geometry


def _hll_estimate(regs: list[int]) -> tuple[int, float]:
    """q312's estimator over a 256-register array: exact dyadic Z sum,
    bias-corrected raw estimate, linear-counting small-range branch —
    replicated with Python floats (IEEE doubles, so bit-identical to
    both engines' SQL arithmetic on the same integer registers)."""
    z = sum(1.0 / (1 << m) for m in sorted(regs, reverse=True))
    # dyadic terms: each is exact, and the full sum spans < 53 bits, so
    # the fold is order-independent — sorting is belt and braces.
    hit = sum(1 for m in regs if m > 0)
    raw = 0.7213 / (1.0 + 1.079 / _HLL_M) * (_HLL_M * _HLL_M) / z
    if raw <= 2.5 * _HLL_M and hit < _HLL_M:
        import math

        est = _HLL_M * math.log(_HLL_M / (_HLL_M - hit))
    else:
        est = raw
    return hit, est


def hll_register_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the oracled HLL family (q312/q173): per event
    type, maintain the 256 md5-register maxima across micro-batches and
    emit the distinct-user estimate after every trigger — the streaming
    cardinality monitor whose state is O(m) per key regardless of
    stream length.

    Exactness contract: registers are the SAME integers the batch
    queries compute (md5 hex digits -> register j = hv div 2^24 mod 256,
    rho = MSB position of the 24-bit suffix), merged by register-wise
    MAX — the HLL union property, so state after any prefix equals the
    batch sketch of that prefix EXACTLY, and the emitted estimate is the
    identical IEEE arithmetic of q312's estimator (dyadic Z, bias
    correction, linear-counting branch).  The twin test replays the fed
    prefix through the batch register algebra and requires equality to
    the last bit.

    Grid budget: hv < 2^32; div 2^24 only shrinks."""
    import hashlib

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        regs = list(state.get[0]) if state.exists else [0] * _HLL_M
        for pdf in batches:
            for uid in pdf["user_id"]:
                hv = int(
                    hashlib.md5(str(int(uid)).encode()).hexdigest()[:8], 16
                )
                j = (hv >> 24) % _HLL_M
                suffix = hv % (1 << 24)
                rho = 25 if suffix == 0 else 24 - suffix.bit_length() + 1
                if rho > regs[j]:
                    regs[j] = rho
        state.update((regs,))
        hit, est = _hll_estimate(regs)
        yield pd.DataFrame(
            {
                "event_type": [etype],
                "registers_hit": [hit],
                "hll_estimate": [est],
            }
        )

    return events.select("event_type", "user_id").groupBy(
        "event_type"
    ).applyInPandasWithState(
        update,
        outputStructType=HLL_SCHEMA,
        stateStructType=_HLL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.types import BooleanType

ANOMALY_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", StringType()),
        StructField("cnt", LongType()),
        StructField("n_trail", LongType()),
        StructField("z", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

_ANOMALY_STATE = StructType(
    [
        StructField("days", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)

_ANOMALY_WINDOW = 28
_ANOMALY_MIN_TRAIL = 14


def trailing_anomaly_stream(daily: DataFrame) -> DataFrame:
    """Streaming twin of q319's trailing-window anomaly flags: consumes
    the daily-aggregate feed (event_type, day, cnt) and scores each
    incoming day against its type's trailing 28-day history held in
    state — O(window) state per key, emission per fed day once
    >= 14 history days exist.

    Exactness contract: state stores the RAW (epoch-day, count) pairs of
    the trailing window, so dev/varnum are the same exact integers the
    batch query aggregates, the |z| >= 3 flag is the same integer
    cross-multiplication, and z the same 6-dp signed sqrt — per-day
    output over an in-order feed equals the batch rows exactly (the twin
    test).  Late EARLIER days merge into the history (future emissions
    see them) but already-emitted rows are not revised — the emit-once
    streaming contract."""
    from datetime import date

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            days, cnts = state.get
            hist = dict(zip(days, cnts))
        else:
            hist = {}
        rows = pd.concat(list(batches)).sort_values("day")
        out = {k: [] for k in ("day", "cnt", "n_trail", "z", "is_anomaly")}
        for day_s, c in zip(rows["day"], rows["cnt"]):
            epoch = date.fromisoformat(str(day_s)).toordinal()
            c = int(c)
            window = [
                v
                for d, v in hist.items()
                if epoch - _ANOMALY_WINDOW <= d <= epoch - 1
            ]
            n = len(window)
            hist[epoch] = hist.get(epoch, 0) + c
            if n < _ANOMALY_MIN_TRAIL:
                continue
            s = sum(window)
            s2 = sum(v * v for v in window)
            dev = n * c - s
            varnum = n * s2 - s * s
            if varnum == 0:
                z = None
                flag = False
            else:
                # replicate the batch EXPRESSION TREE operation by
                # operation (CAST(dev*dev AS DOUBLE) * (n-1) /
                # (CAST(n AS DOUBLE) * varnum)) — an exact-integer
                # ratio computed in a different association can differ
                # by one ulp and flip the 6-dp round
                z2 = (float(dev * dev) * (n - 1)) / (float(n) * varnum)
                zval = (-1.0 if dev < 0 else 1.0) * z2**0.5
                z = _round6_half_away(zval)
                flag = dev * dev * (n - 1) >= 9 * n * varnum
            out["day"].append(str(day_s))
            out["cnt"].append(c)
            out["n_trail"].append(n)
            out["z"].append(z)
            out["is_anomaly"].append(flag)
        # prune state to the trailing window behind the newest day
        if hist:
            mx = max(hist)
            hist = {d: v for d, v in hist.items() if d >= mx - _ANOMALY_WINDOW}
        state.update((list(hist.keys()), list(hist.values())))
        if out["day"]:
            yield pd.DataFrame(
                {
                    "event_type": [etype] * len(out["day"]),
                    **out,
                }
            )

    return daily.select("event_type", "day", "cnt").groupBy(
        "event_type"
    ).applyInPandasWithState(
        update,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_ANOMALY_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TWAP_STATE = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_xu", LongType()),
        StructField("num_str", StringType()),
        StructField("den_us", LongType()),
        StructField("n_intervals", LongType()),
    ]
)

TWAP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n_intervals", LongType()),
        StructField("num_str", StringType()),
        StructField("den_us", LongType()),
    ]
)


def twap_stream(events: DataFrame, tiebreak_col: str | None = None) -> DataFrame:
    """Streaming twin of q332's time-weighted average: per
    (user_id, event_type), maintain the last held (ts, value) plus the
    exact interval accumulators Σ value_µ·dt_µs and Σ dt_µs across
    micro-batches, emitting the running per-key totals after every
    trigger.  Input contract: columns (user_id, event_type, ts_us,
    value) with ts_us = epoch MICROSECONDS (pre-converted by the caller
    — integer timestamps keep the twin free of timezone semantics), fed
    in non-decreasing ts order per key ACROSS batches (rows are sorted
    within each batch; a cross-batch regression raises, the in-order
    contract the decayed-counter twin enforces for days).

    Equal-timestamp contract (ADVICE r9): the batch twin q332 orders by
    (ts, event_id), so two same-key events sharing a ts_us must reach
    this twin in event_id order or the held value after the tie can
    differ.  Either pre-sort the feed by (ts_us, event_id) — the
    within-batch sort is STABLE, so feed order is preserved — or pass
    ``tiebreak_col`` (e.g. "event_id") and the twin sorts each batch by
    (ts_us, tiebreak) itself; cross-batch ties still follow feed order,
    which the pre-sorted-feed contract covers.

    Exactness contract: xu = floor(value·1e6 + 0.5) is the identical
    IEEE expression the batch builder evaluates; dt is exact integer
    microseconds; the numerator accumulates as a Python big-int carried
    in state as a STRING (Σ xu·dt exceeds int64 on long-held keys), so
    after any in-order prefix the per-key state equals the batch
    aggregate over that prefix EXACTLY — the twin test folds the final
    per-key emissions per type and requires q332's published integers
    and half-away rationals to the bit."""
    import math

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid, etype = key
        if state.exists:
            last_ts, last_xu, num_str, den, n = state.get
            num = int(num_str)
        else:
            last_ts, last_xu, num, den, n = None, None, 0, 0, 0
        rows = pd.concat(list(batches))
        sort_cols = ["ts_us"] + ([tiebreak_col] if tiebreak_col else [])
        rows = rows[rows["value"].notna()].sort_values(sort_cols, kind="mergesort")
        for ts, val in zip(rows["ts_us"], rows["value"]):
            ts = int(ts)
            xu = math.floor(float(val) * 1000000 + 0.5)
            if last_ts is not None:
                if ts < last_ts:
                    raise ValueError(
                        "twap_stream: out-of-order ts across micro-batches "
                        f"for key ({uid}, {etype}): {ts} < {last_ts} — the "
                        "feed must be non-decreasing per key"
                    )
                dt = ts - last_ts
                num += last_xu * dt
                den += dt
                n += 1
            last_ts, last_xu = ts, xu
        state.update((last_ts, last_xu, str(num), den, n))
        yield pd.DataFrame(
            {
                "user_id": [uid],
                "event_type": [etype],
                "n_intervals": [n],
                "num_str": [str(num)],
                "den_us": [den],
            }
        )

    cols = ["user_id", "event_type", "ts_us", "value"] + (
        [tiebreak_col] if tiebreak_col else []
    )
    return events.select(*cols).groupBy(
        "user_id", "event_type"
    ).applyInPandasWithState(
        update,
        outputStructType=TWAP_SCHEMA,
        stateStructType=_TWAP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SPRT_STATE = StructType(
    [
        StructField("cum_s", LongType()),
        StructField("cum_f", LongType()),
        StructField("last_day", StringType()),
        StructField("decided", StringType()),
    ]
)

SPRT_SCHEMA = StructType(
    [
        StructField("stream", StringType()),
        StructField("day", StringType()),
        StructField("cum_trials", LongType()),
        StructField("cum_conv", LongType()),
        StructField("llr12", LongType()),
        StructField("verdict", StringType()),
    ]
)


def sprt_stream(daily: DataFrame, la12: int, lb12: int, a12: int) -> DataFrame:
    """Streaming twin of q346's SPRT replay: consumes an in-order DAILY
    feed (stream, day, trials, conv) and maintains the cumulative
    success/failure counts across micro-batches, emitting the LLR and
    Wald verdict after each day.  The hypotheses (la12/lb12 increments
    and boundary a12, 1e-12-unit integers) are PARAMETERS — a real
    sequential test prespecifies them; q346 derives them from the
    first-half rate offline and the twin test feeds exactly those.

    Exactness contract: state is two integers; the emitted LLR is
    s·la12 + f·lb12 — the identical pure-integer arithmetic of the
    batch query, so after any in-order prefix the trajectory equals the
    batch rows bit-for-bit.  Once a boundary is crossed the verdict
    FREEZES (sequential tests stop at first crossing; the batch query
    publishes the raw per-day comparison instead — the twin test
    compares pre-crossing rows exactly and checks the freeze point
    against the batch's first non-continue row).  Out-of-order days
    across batches raise (the twap_stream in-order contract)."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (stream,) = key
        if state.exists:
            s, f_cnt, last_day, decided = state.get
        else:
            s, f_cnt, last_day, decided = 0, 0, None, None
        rows = pd.concat(list(batches)).sort_values("day")
        out = []
        for day, tr, cv in zip(rows["day"], rows["trials"], rows["conv"]):
            day = str(day)
            if last_day is not None and day <= last_day:
                raise ValueError(
                    f"sprt_stream: out-of-order day {day} <= {last_day}"
                )
            last_day = day
            s += int(cv)
            f_cnt += int(tr) - int(cv)
            llr = s * la12 + f_cnt * lb12
            if decided is None:
                if llr >= a12:
                    verdict = "accept_h1"
                    decided = verdict
                elif llr <= -a12:
                    verdict = "accept_h0"
                    decided = verdict
                else:
                    verdict = "continue"
            else:
                verdict = decided  # frozen at first crossing
            out.append((stream, day, s + f_cnt, s, llr, verdict))
        state.update((s, f_cnt, last_day, decided))
        yield pd.DataFrame(
            out,
            columns=[
                "stream", "day", "cum_trials", "cum_conv", "llr12", "verdict"
            ],
        )

    return daily.select("stream", "day", "trials", "conv").groupBy(
        "stream"
    ).applyInPandasWithState(
        update,
        outputStructType=SPRT_SCHEMA,
        stateStructType=_SPRT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_STREAM_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("gen", LongType()),
        StructField("u", LongType()),
    ]
)

_KMV_STATE = StructType(
    [
        StructField("gen", LongType()),
        StructField("us", ArrayType(LongType())),
    ]
)


def kmv_stream(items: DataFrame, k: int = 32) -> DataFrame:
    """Streaming KMV (bottom-k distinct sketch) — the unbounded-feed
    twin of the catalog's kmv kind (operators/statcat.key_sketches):
    input rows carry (name, item); per name the state is the k smallest
    52-bit md5 hashes of the distinct items seen so far, advanced per
    micro-batch and emitted with a generation counter.

    Because bottom-k-of-union is associative and order-free (the
    merge_catalogs identity), the snapshot after ANY trigger equals the
    batch sketch of everything fed so far under ANY slicing — the same
    strength as the CMS twin, and together they make the whole additive
    stats catalog streaming-maintainable (hist stays rebuild-only).
    State is ≤ k longs per name, O(1) in stream length."""
    import hashlib

    def _u52(item: str) -> int:
        return int(hashlib.md5(item.encode()).hexdigest()[:13], 16)

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (name,) = key
        if state.exists:
            gen, prev = state.get
            us = set(prev)
        else:
            gen, us = 0, set()
        for pdf in batches:
            for item in pdf["item"].dropna().unique():
                us.add(_u52(str(item)))
        best = sorted(us)[:k]
        gen += 1
        state.update((gen, [int(x) for x in best]))
        yield pd.DataFrame(
            {
                "name": [name] * len(best),
                "gen": [gen] * len(best),
                "u": best,
            }
        )

    keyed = items.select(
        F.col("name").cast("string").alias("name"),
        F.col("item").cast("string").alias("item"),
    )
    return keyed.groupBy("name").applyInPandasWithState(
        update,
        outputStructType=KMV_STREAM_SCHEMA,
        stateStructType=_KMV_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EW_STREAM_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("gen", LongType()),
        StructField("b", LongType()),
        StructField("c", LongType()),
    ]
)

_EW_STATE = StructType(
    [
        StructField("gen", LongType()),
        StructField("bs", ArrayType(LongType())),
        StructField("cs", ArrayType(LongType())),
    ]
)


def ew_stream(values: DataFrame, cell_micro: int) -> DataFrame:
    """Streaming fixed-grid equi-width histogram — the unbounded-feed
    twin of the catalog's ew kind (operators/statcat.equiwidth_counts):
    input rows carry (name, x); per name the state is the per-bucket
    count map over the spec grid (bucket = floor(x·1e6 + 0.5) div
    cell_micro), advanced per micro-batch and emitted with a generation
    counter.

    Because per-bucket addition is associative and commutative (the
    merge_catalogs additive identity), the snapshot after ANY trigger
    equals the batch histogram of everything fed so far under ANY
    slicing — the property that makes the ew kind the STREAMING-
    maintainable distribution summary (equi-depth boundaries, being
    order statistics, can never have a twin like this).  State is one
    long per OCCUPIED bucket, bounded by the value range over the spec
    cell — independent of stream length.

    The micro snap is numpy floor on float64 — bit-identical to Spark's
    floor(x·1e6 + 0.5) on DOUBLE (same IEEE ops).  Negative values
    raise (the operator's non-negative grid contract)."""
    import numpy as np

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (name,) = key
        if state.exists:
            gen, bs, cs = state.get
            counts = dict(zip(bs, cs))
        else:
            gen, counts = 0, {}
        for pdf in batches:
            x = pdf["x"].dropna().to_numpy(dtype="float64")
            if len(x) == 0:
                continue
            xu = np.floor(x * 1_000_000 + 0.5).astype("int64")
            if (xu < 0).any():
                raise ValueError(
                    "ew_stream: negative value — the ew grid is"
                    " non-negative-only (operators/statcat contract)"
                )
            b, c = np.unique(xu // cell_micro, return_counts=True)
            for bi, ci in zip(b.tolist(), c.tolist()):
                counts[bi] = counts.get(bi, 0) + ci
        gen += 1
        items = sorted(counts.items())
        state.update((gen, [b for b, _ in items], [c for _, c in items]))
        yield pd.DataFrame(
            {
                "name": [name] * len(items),
                "gen": [gen] * len(items),
                "b": [b for b, _ in items],
                "c": [c for _, c in items],
            }
        )

    keyed = values.select(
        F.col("name").cast("string").alias("name"),
        F.col("x").cast("double").alias("x"),
    )
    return keyed.groupBy("name").applyInPandasWithState(
        update,
        outputStructType=EW_STREAM_SCHEMA,
        stateStructType=_EW_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MINH_STREAM_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("gen", LongType()),
        StructField("r", LongType()),
        StructField("v", LongType()),
    ]
)

_MINH_STATE = StructType(
    [
        StructField("gen", LongType()),
        StructField("vs", ArrayType(LongType())),
    ]
)


def minh_stream(items: DataFrame, slots: int = 16) -> DataFrame:
    """Streaming MinHash signature — the unbounded-feed twin of the
    catalog's minh kind (operators/statcat.minhash_rows): per name the
    state is the per-slot minimum 52-bit md5 hash of ``r:item`` over
    everything seen, advanced per micro-batch and emitted with a
    generation counter.

    Slot-wise MIN is associative, commutative AND idempotent, so the
    snapshot after any trigger equals the batch signature of everything
    fed so far under any slicing — and re-delivered items are harmless
    (at-least-once delivery needs no dedup), a strictly stronger
    property than the additive kinds have.  State is exactly ``slots``
    longs per name, O(1) in stream length."""
    import hashlib

    def _u52(r: int, item: str) -> int:
        return int(
            hashlib.md5(f"{r}:{item}".encode()).hexdigest()[:13], 16
        )

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (name,) = key
        if state.exists:
            gen, vs = state.get
            vs = list(vs)
        else:
            gen, vs = 0, [None] * slots
        for pdf in batches:
            for item in pdf["item"].dropna().unique():
                for r in range(slots):
                    u = _u52(r, str(item))
                    if vs[r] is None or u < vs[r]:
                        vs[r] = u
        gen += 1
        state.update((gen, vs))
        occupied = [(r, v) for r, v in enumerate(vs) if v is not None]
        yield pd.DataFrame(
            {
                "name": [name] * len(occupied),
                "gen": [gen] * len(occupied),
                "r": [r for r, _ in occupied],
                "v": [v for _, v in occupied],
            }
        )

    keyed = items.select(
        F.col("name").cast("string").alias("name"),
        F.col("item").cast("string").alias("item"),
    )
    return keyed.groupBy("name").applyInPandasWithState(
        update,
        outputStructType=MINH_STREAM_SCHEMA,
        stateStructType=_MINH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRI_STREAM_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("gen", LongType()),
        StructField("r", LongType()),
        StructField("b", LongType()),
        StructField("v", LongType()),
    ]
)

_TRI_STATE = StructType(
    [
        StructField("gen", LongType()),
        StructField("n", LongType()),
        StructField("bs", ArrayType(LongType())),
        StructField("cs", ArrayType(LongType())),
    ]
)


def tri_stream(texts: DataFrame) -> DataFrame:
    """Streaming trigram document-frequency profile — the unbounded-feed
    twin of the catalog's tri kind (operators/statcat.trigram_rows):
    input rows carry (name, s); per name the state is the per-trigram
    df-count map (52-bit md5 keys, per-ROW distinct trigrams — exactly
    the batch builder's semantics) plus the row-count register,
    advanced per micro-batch and emitted with a generation counter.

    Because both row shapes are ADDITIVE over disjoint row sets (the
    merge_catalogs additive identity q407 gates), the snapshot after
    ANY trigger equals the batch build of everything fed so far under
    ANY slicing — the same property that made the ew kind streaming-
    maintainable.  State is one long per OBSERVED trigram, bounded by
    the trigram vocabulary (the batch kind's artifact-size contract),
    independent of stream length.  Hashing is hashlib md5 on the utf-8
    bytes — identical to both engines' md5 of the same string."""
    import hashlib

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (name,) = key
        if state.exists:
            gen, n, bs, cs = state.get
            counts = dict(zip(bs, cs))
        else:
            gen, n, counts = 0, 0, {}
        for pdf in batches:
            for s in pdf["s"].dropna():
                s = str(s)
                n += 1
                if len(s) >= 3:
                    for g in {s[i : i + 3] for i in range(len(s) - 2)}:
                        b = int(hashlib.md5(g.encode()).hexdigest()[:13], 16)
                        counts[b] = counts.get(b, 0) + 1
        gen += 1
        items = sorted(counts.items())
        state.update(
            (gen, n, [b for b, _ in items], [c for _, c in items])
        )
        yield pd.DataFrame(
            {
                "name": [name] * (len(items) + 1),
                "gen": [gen] * (len(items) + 1),
                "r": [0] * len(items) + [1],
                "b": [b for b, _ in items] + [0],
                "v": [c for _, c in items] + [n],
            }
        )

    keyed = texts.select(
        F.col("name").cast("string").alias("name"),
        F.col("s").cast("string").alias("s"),
    )
    return keyed.groupBy("name").applyInPandasWithState(
        update,
        outputStructType=TRI_STREAM_SCHEMA,
        stateStructType=_TRI_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Streaming session heuristics — explicit-END sessions with custom state
(SURVEY §2.6/W3, the reference's hardest-to-map behavior).

The reference keys state by (application_id, attempt_id), registers every
container it sees, and finalizes the app when a STATE_EVENT(state=END)
arrives for the LAST live container (Heuristics.java:129-158).  Spark's
``session_window`` is gap-based, so we keep an explicit container set in
``applyInPandasWithState`` — one state entry per app attempt, timeout-free
(the END marker is the close signal, as in the reference).

In-state heuristics implemented here (same math as heuristics.batch):
HeapUsage, Safepoints, FileHeuristic.  The trio mirrors the reference's
extension protocol: ``process`` (per event) / ``onContainerCompleted``
(on that container's END) / ``onAppCompleted`` (on last END) — see
Heuristic.java.

Scale: state per key is O(live containers per app) counters — bounded
(~10²), independent of event volume.  The input union projects ONLY the
columns each heuristic needs before hitting Python, and Arrow moves
batches; the groupBy(app, attempt) shuffle is the same one the batch
engine pays.

Details are emitted as a JSON string (map<string,string> serialized) —
the streaming sink contract; heuristics.batch emits a native map column.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from garmadon_spark.heuristics.base import MAX_CONTAINERS_PER_HEURISTIC, Severity
from garmadon_spark.operators.jvmstats import _sections_map, section_prop

RESULT_SCHEMA = StructType(
    [
        StructField("application_id", StringType()),
        StructField("attempt_id", StringType()),
        StructField("heuristic", StringType()),
        StructField("severity", IntegerType()),
        StructField("score", IntegerType()),
        StructField("details_json", StringType()),
    ]
)

STATE_SCHEMA = StructType([StructField("state_json", StringType())])

_UNION_COLS = [
    "application_id", "attempt_id", "container_id", "timestamp",
    "kafka_offset", "kind", "heap_used", "heap_max", "major_gc",
    "sp_count", "action", "state",
]


def prepare_session_input(
    jvmstats: DataFrame | None = None,
    fs_events: DataFrame | None = None,
    state_events: DataFrame | None = None,
) -> DataFrame:
    """Project each event family down to the session engine's narrow
    union schema (JVM-side; Python sees only these columns)."""
    parts = []
    if jvmstats is not None:
        smap = _sections_map("section")
        majors = [
            section_prop(smap, f"gc({n})", "count", "long")
            for n in ("MarkSweepCompact", "PS MarkSweep",
                      "ConcurrentMarkSweep", "G1 Old Generation")
        ]
        parts.append(
            jvmstats.select(
                "application_id", "attempt_id", "container_id", "timestamp",
                "kafka_offset",
                F.lit("jvm").alias("kind"),
                section_prop(smap, "heap", "used", "long").alias("heap_used"),
                section_prop(smap, "heap", "max", "long").alias("heap_max"),
                F.greatest(*majors, F.lit(0)).alias("major_gc"),
                section_prop(smap, "safepoints", "count", "long").alias("sp_count"),
                F.lit(None).cast("string").alias("action"),
                F.lit(None).cast("string").alias("state"),
            )
        )
    if fs_events is not None:
        parts.append(
            fs_events.select(
                "application_id", "attempt_id", "container_id", "timestamp",
                "kafka_offset",
                F.lit("fs").alias("kind"),
                *[F.lit(None).cast("long").alias(c)
                  for c in ("heap_used", "heap_max", "major_gc", "sp_count")],
                F.col("action"),
                F.lit(None).cast("string").alias("state"),
            )
        )
    if state_events is not None:
        parts.append(
            state_events.select(
                "application_id", "attempt_id", "container_id", "timestamp",
                "kafka_offset",
                F.lit("state").alias("kind"),
                *[F.lit(None).cast("long").alias(c)
                  for c in ("heap_used", "heap_max", "major_gc", "sp_count")],
                F.lit(None).cast("string").alias("action"),
                F.col("state"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


class SessionHeuristic:
    """Extension protocol — the PySpark form of the reference's
    ``Heuristic`` interface trio ``process`` / ``onContainerCompleted``
    / ``onAppCompleted`` (readers/heuristics/.../Heuristic.java;
    registration at Heuristics.java:57-77).

    Subclass, then pass instances via ``session_heuristics(...,
    heuristics=[...])`` or register globally with
    ``register_heuristic``.  Each instance owns a private state dict
    (JSON-serialized between micro-batches — keep it JSON-safe and
    O(containers), not O(events))."""

    name = "Custom"

    def new_state(self) -> dict:
        return {}

    def process(self, s: dict, row) -> None:
        """Per event, any kind — `row` carries the narrow union schema
        (_UNION_COLS)."""

    def on_container_completed(self, s: dict, container_id: str) -> None:
        """Called when STATE_EVENT(END) arrives for a container."""

    def on_app_completed(
        self, application_id: str, attempt_id: str, s: dict
    ) -> list[dict]:
        """Called once when the last live container ends; return result
        rows: dicts with heuristic/severity/score/details_json."""
        return []


_REGISTERED: list[SessionHeuristic] = []


def register_heuristic(h: SessionHeuristic) -> SessionHeuristic:
    """Globally register a custom heuristic (GarmadonSerialization
    .register analogue for the heuristics surface).  Registered
    instances run in every subsequent ``session_heuristics`` call that
    doesn't pass an explicit list."""
    _REGISTERED.append(h)
    return h


def _new_state() -> dict:
    return {"live": [], "seen": [], "heap": {}, "sp": {}, "fs": {},
            "ext": {}}


def _process_row(s: dict, r, heuristics: list[SessionHeuristic] = ()) -> None:
    for h in heuristics:
        ext = s["ext"].setdefault(h.name, h.new_state())
        h.process(ext, r)
        if (r.kind == "state" and r.state == "END"
                and r.container_id in s["live"]):
            h.on_container_completed(ext, r.container_id)
    cid = r.container_id
    if cid and cid not in s["seen"]:
        s["seen"].append(cid)
        s["live"].append(cid)
    if r.kind == "jvm":
        h = s["heap"].setdefault(cid, {"max": 0, "peak": 0, "major": 0})
        if r.heap_max is not None and not pd.isna(r.heap_max):
            h["max"] = int(r.heap_max)
        if r.heap_used is not None and not pd.isna(r.heap_used):
            h["peak"] = max(h["peak"], int(r.heap_used))
        if r.major_gc is not None and not pd.isna(r.major_gc):
            h["major"] = max(h["major"], int(r.major_gc))
        if r.sp_count is not None and not pd.isna(r.sp_count):
            sp = s["sp"].setdefault(
                cid, {"last": 0, "last_ts": 0, "ratio": 0, "sev": 0})
            cur, ts = int(r.sp_count), int(r.timestamp)
            last, last_ts = sp["last"], sp["last_ts"]
            sp["last"], sp["last_ts"] = cur, ts
            if ts != last_ts and last_ts != 0 and last != 0:
                rate = (cur - last) * 1000 // (ts - last_ts)
                sev = Severity.NONE
                if rate > 3:
                    sev = Severity.LOW
                if rate > 5:
                    sev = Severity.MODERATE
                if rate > 7:
                    sev = Severity.SEVERE
                if rate > 10:
                    sev = Severity.CRITICAL
                sp["ratio"] = max(sp["ratio"], rate)
                sp["sev"] = max(sp["sev"], sev)
    elif r.kind == "fs" and isinstance(r.action, str):
        s["fs"][r.action] = s["fs"].get(r.action, 0) + 1
    elif r.kind == "state" and r.state == "END" and cid in s["live"]:
        s["live"].remove(cid)
        # onContainerCompleted: drop NONE safepoint containers
        sp = s["sp"].get(cid)
        if sp is not None and sp["sev"] == Severity.NONE:
            del s["sp"][cid]


def _details(per_container: dict[str, str]) -> str:
    if len(per_container) > MAX_CONTAINERS_PER_HEURISTIC:
        return json.dumps({"Containers": str(len(per_container))},
                          sort_keys=True)
    return json.dumps(per_container, sort_keys=True)


def _finalize(app_id: str, attempt_id: str, s: dict,
              max_created_files: int,
              heuristics: list[SessionHeuristic] = ()) -> list[dict]:
    out = []
    for h in heuristics:
        ext = s["ext"].setdefault(h.name, h.new_state())
        for row in h.on_app_completed(app_id, attempt_id, ext):
            out.append(dict(application_id=app_id, attempt_id=attempt_id,
                            heuristic=row.get("heuristic", h.name),
                            severity=int(row.get("severity", 0)),
                            score=int(row.get("score", row.get("severity", 0))),
                            details_json=row.get("details_json", "{}")))
    # HeapUsage (HeapUsage.java:76-95)
    heap_details, heap_sev = {}, Severity.NONE
    for cid, h in s["heap"].items():
        if h["major"] > 0 or h["max"] <= h["peak"]:
            continue
        ratio = (h["max"] - h["peak"]) * 100 // h["max"]
        sev = Severity.NONE
        if ratio > 30:
            sev = Severity.LOW
        if ratio > 50:
            sev = Severity.MODERATE
        if ratio > 70:
            sev = Severity.SEVERE
        heap_sev = max(heap_sev, sev)
        heap_details[cid] = f"unused memory %: {ratio}"
    if heap_details:
        out.append(dict(application_id=app_id, attempt_id=attempt_id,
                        heuristic="HeapUsage", severity=heap_sev,
                        score=heap_sev, details_json=_details(heap_details)))
    # Safepoints (Safepoints.java)
    sp_details, sp_sev = {}, Severity.NONE
    for cid, sp in s["sp"].items():
        if sp["sev"] == Severity.NONE:
            continue
        sp_sev = max(sp_sev, sp["sev"])
        sp_details[cid] = f"Max safepoint/s: {sp['ratio']}"
    if sp_details:
        out.append(dict(application_id=app_id, attempt_id=attempt_id,
                        heuristic="Safepoints", severity=sp_sev,
                        score=sp_sev, details_json=_details(sp_details)))
    # FileHeuristic (FileHeuristic.java:76-97)
    if s["fs"]:
        labels = {
            "DELETE": "Files deleted", "READ": "Files read",
            "WRITE": "Files written", "RENAME": "Files renamed",
            "APPEND": "Files appended", "LIST_STATUS": "List status performed",
            "ADD_BLOCK": "Blocks added",
            "GET_CONTENT_SUMMARY": "Content summary retrieved",
        }
        written = s["fs"].get("WRITE", 0)
        sev = Severity.NONE
        if written > max_created_files // 10:
            sev = Severity.LOW
        if written > max_created_files // 2:
            sev = Severity.MODERATE
        if written > max_created_files:
            sev = Severity.SEVERE
        details = {lab: str(s["fs"].get(a, 0)) for a, lab in labels.items()}
        out.append(dict(application_id=app_id, attempt_id=attempt_id,
                        heuristic="FileHeuristic", severity=sev, score=sev,
                        details_json=json.dumps(details, sort_keys=True)))
    return out


def make_session_fn(max_created_files: int = 100_000,
                    heuristics: list[SessionHeuristic] | None = None):
    hs = list(_REGISTERED) if heuristics is None else list(heuristics)

    def session_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        app_id, attempt_id = key
        s = json.loads(state.get[0]) if state.exists else _new_state()
        s.setdefault("ext", {})
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["timestamp", "kafka_offset"])
        for r in rows.itertuples():
            _process_row(s, r, hs)
        if s["seen"] and not s["live"]:
            results = _finalize(app_id, attempt_id, s, max_created_files, hs)
            state.remove()
            yield pd.DataFrame(results, columns=[f.name for f in RESULT_SCHEMA])
        else:
            state.update((json.dumps(s),))
            yield pd.DataFrame([], columns=[f.name for f in RESULT_SCHEMA])

    return session_fn


class SessionStatefulProcessor(StatefulProcessor):
    """Spark 4-native form of the session engine on the
    ``transformWithState`` operator (SPARK-49564): identical semantics
    to ``session_heuristics`` (same _process_row/_finalize core), state
    held in a named ValueState on the RocksDB state store.

    Why offer both: applyInPandasWithState is the Spark 3.4+ surface
    (HDFS-backed store, whole-state round-trip per key per batch);
    transformWithState adds granular state types, TTL, and timers, and
    RocksDB changelog checkpointing keeps per-batch commit cost
    proportional to the CHANGED keys — the right backend when millions
    of YARN apps are live at once."""

    def __init__(self, max_created_files: int = 100_000,
                 heuristics: list[SessionHeuristic] | None = None):
        self.max_created_files = max_created_files
        self.heuristics = (list(_REGISTERED) if heuristics is None
                           else list(heuristics))

    def init(self, handle) -> None:
        self._state = handle.getValueState("session", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        app_id, attempt_id = key
        s = (json.loads(self._state.get()[0]) if self._state.exists()
             else _new_state())
        s.setdefault("ext", {})
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["timestamp", "kafka_offset"])
        for r in pdf.itertuples():
            _process_row(s, r, self.heuristics)
        if s["seen"] and not s["live"]:
            results = _finalize(app_id, attempt_id, s,
                                self.max_created_files, self.heuristics)
            self._state.clear()
            yield pd.DataFrame(results,
                               columns=[f.name for f in RESULT_SCHEMA])
        else:
            self._state.update((json.dumps(s),))

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        yield from ()

    def close(self) -> None:
        pass


def session_heuristics_tws(
    events: DataFrame, max_created_files: int = 100_000,
    heuristics: list[SessionHeuristic] | None = None,
) -> DataFrame:
    """``session_heuristics`` on the transformWithState operator.
    Requires (a) the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider) set on the session before starting
    the query, and (b) the ``protobuf`` Python package (the operator's
    Python↔JVM state protocol) — environments without it use
    ``session_heuristics``, which is semantically identical."""
    return (
        events.groupBy("application_id", "attempt_id")
        .transformWithStateInPandas(
            SessionStatefulProcessor(max_created_files, heuristics),
            outputStructType=RESULT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def session_heuristics(
    events: DataFrame, max_created_files: int = 100_000,
    heuristics: list[SessionHeuristic] | None = None,
) -> DataFrame:
    """Run the explicit-END session engine over a (streaming or batch-
    prepared) union from ``prepare_session_input``.  On a stream this
    emits one result batch per completed app; state lives until the END
    marker, exactly like the reference's registry."""
    return (
        events.groupBy("application_id", "attempt_id")
        .applyInPandasWithState(
            make_session_fn(max_created_files, heuristics),
            outputStructType=RESULT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

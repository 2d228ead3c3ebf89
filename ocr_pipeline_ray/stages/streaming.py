"""Stateful streaming operators: incremental state in keyed actors.

Ray Data has no event-time windows; for stream-shaped semantics that
genuinely need *incremental* state (an unbounded log processed in
arrival order with bounded memory), the Dataset API can't express the
operator — this is the documented last-resort case for raw Ray actors
(SURVEY §2 custom-operator rule (c)).

``StreamingSessionizer``: one actor per key-hash bucket holds the open
sessions for its keys; the driver streams ts-ordered batches through
``iter_batches`` and routes each batch's rows to the owning buckets.
Sessions close when the inactivity gap passes; a final ``flush``
drains still-open sessions. State is bounded by (keys/bucket × open
session record), independent of log length.

Ordering contract (stated per the guide): input batches must arrive in
global ``ts`` order — the caller sorts first (``ds.sort("ts")``) or
reads a ts-partitioned log in partition order. Results equal the batch
``pipelines.windows.events_sessions`` exactly (tested).
"""

from __future__ import annotations

import pandas as pd
import ray


@ray.remote(num_cpus=0.5)
class SessionBucket:
    """Holds open sessions for the keys hashed to this bucket."""

    def __init__(self, gap_seconds: float) -> None:
        self.gap = pd.Timedelta(seconds=gap_seconds)
        self.open: dict[int, dict] = {}  # user_id -> session record

    def feed(self, df: pd.DataFrame) -> list[dict]:
        """Consume a ts-ordered slice; return sessions closed by it."""
        closed: list[dict] = []
        for row in df.itertuples(index=False):
            s = self.open.get(row.user_id)
            if s is not None and (row.ts - s["last_ts"]) > self.gap:
                closed.append(self._emit(s))
                s = None
            if s is None:
                self.open[row.user_id] = {
                    "user_id": row.user_id, "start": row.ts,
                    "last_ts": row.ts, "n_events": 1}
            else:
                s["last_ts"] = row.ts
                s["n_events"] += 1
        return closed

    def flush(self) -> list[dict]:
        out = [self._emit(s) for s in self.open.values()]
        self.open.clear()
        return out

    @staticmethod
    def _emit(s: dict) -> dict:
        return {
            "user_id": s["user_id"],
            "session_start": s["start"].strftime("%Y-%m-%d %H:%M:%S.%f"),
            "n_events": s["n_events"],
            "duration_s": (s["last_ts"] - s["start"]).total_seconds(),
        }


def sessionize_streaming(events_ds, gap_minutes: int = 30,
                         num_buckets: int = 4) -> pd.DataFrame:
    """Drive the keyed-actor sessionizer over a ts-sorted event stream."""
    actors = [SessionBucket.remote(gap_minutes * 60)
              for _ in range(num_buckets)]
    pending = []
    ds = events_ds.sort(["ts", "event_id"])
    for batch in ds.iter_batches(batch_size=8192, batch_format="pandas"):
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        for b in range(num_buckets):
            part = batch[batch["user_id"] % num_buckets == b]
            if len(part):
                pending.append(actors[b].feed.remote(part))
    closed = [row for chunk in ray.get(pending) for row in chunk]
    closed += [row for a in actors
               for row in ray.get(a.flush.remote())]
    for a in actors:
        ray.kill(a)
    out = pd.DataFrame(closed, columns=["user_id", "session_start",
                                        "n_events", "duration_s"])
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["user_id", "session_start"]).reset_index(drop=True)

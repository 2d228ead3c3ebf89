"""Stateful streaming operators: incremental state in keyed actors.

Ray Data has no event-time windows; for stream-shaped semantics that
genuinely need *incremental* state (an unbounded log processed in
arrival order with bounded memory), the Dataset API can't express the
operator — this is the documented last-resort case for raw Ray actors
(SURVEY §2 custom-operator rule (c)).

``StreamingSessionizer``: one actor per key-hash bucket holds the open
sessions for its keys. Ingestion is DISTRIBUTED: after the global ts
sort, the sorted blocks (object refs — rows never touch the driver)
are fanned out to ``_feed_block`` tasks, each of which splits its
block by key hash and ships the slices straight to the owning bucket
actors, tagged with the block's global sequence number. Because
concurrent feeder tasks can deliver out of order, each actor holds a
small REORDER BUFFER and consumes slices in sequence order as the
contiguous prefix arrives (every feeder sends its seq to every bucket
— empty slices advance the watermark), so per-key state still sees a
ts-ordered stream and memory stays bounded by (open sessions +
in-flight slices). The driver only coordinates: sort → launch feeders
→ drain. Sessions close when the inactivity gap passes; ``drain``
flushes still-open sessions.

Ordering contract (stated per the guide): the global ``ts`` sort
provides it here; a production log would read ts-partitioned input in
partition order and use the partition index as the sequence number.
Results equal the batch ``pipelines.windows.events_sessions`` exactly
(tested).
"""

from __future__ import annotations

import pandas as pd
import ray


@ray.remote(num_cpus=0.5)
class SessionBucket:
    """Holds open sessions for the keys hashed to this bucket, plus a
    sequence reorder buffer for out-of-order feeder deliveries."""

    def __init__(self, gap_seconds: float) -> None:
        self.gap = pd.Timedelta(seconds=gap_seconds)
        self.open: dict[int, dict] = {}  # user_id -> session record
        self.closed: list[dict] = []
        self.buf: dict[int, pd.DataFrame | None] = {}
        self.next_seq = 0

    def feed(self, seq: int, df: pd.DataFrame | None) -> None:
        """Accept slice ``seq`` (possibly empty); consume the contiguous
        prefix of buffered slices in sequence order."""
        self.buf[seq] = df
        while self.next_seq in self.buf:
            part = self.buf.pop(self.next_seq)
            self.next_seq += 1
            if part is not None and len(part):
                self._consume(part)

    def _consume(self, df: pd.DataFrame) -> None:
        for row in df.itertuples(index=False):
            s = self.open.get(row.user_id)
            if s is not None and (row.ts - s["last_ts"]) > self.gap:
                self.closed.append(self._emit(s))
                s = None
            if s is None:
                self.open[row.user_id] = {
                    "user_id": row.user_id, "start": row.ts,
                    "last_ts": row.ts, "n_events": 1}
            else:
                s["last_ts"] = row.ts
                s["n_events"] += 1

    def drain(self) -> list[dict]:
        """All feeders done: consume any buffered tail, flush open
        sessions, return everything closed."""
        for seq in sorted(self.buf):
            part = self.buf[seq]
            if part is not None and len(part):
                self._consume(part)
        self.buf.clear()
        out = self.closed + [self._emit(s) for s in self.open.values()]
        self.closed, self.open = [], {}
        return out

    @staticmethod
    def _emit(s: dict) -> dict:
        return {
            "user_id": s["user_id"],
            "session_start": s["start"].strftime("%Y-%m-%d %H:%M:%S.%f"),
            "n_events": s["n_events"],
            "duration_s": (s["last_ts"] - s["start"]).total_seconds(),
        }


@ray.remote
def _feed_block(seq: int, block, actors: list, num_buckets: int) -> int:
    """Split one sorted block by key hash and ship each slice straight
    to its bucket actor (empty slices too — they advance the actors'
    sequence watermark). Returns after the actors accept the slices,
    which backpressures the feeder pool."""
    df = block.to_pandas()
    df = df.sort_values(["ts", "event_id"], kind="mergesort")
    pending = []
    for b in range(num_buckets):
        part = df[df["user_id"] % num_buckets == b]
        pending.append(actors[b].feed.remote(seq, part if len(part) else None))
    ray.get(pending)
    return seq


def sessionize_streaming(events_ds, gap_minutes: int = 30,
                         num_buckets: int = 4) -> pd.DataFrame:
    """Keyed-actor sessionizer with distributed ingestion: the driver
    sorts, hands sorted-block REFS to feeder tasks and drains — event
    rows themselves never pass through it."""
    actors = [SessionBucket.remote(gap_minutes * 60)
              for _ in range(num_buckets)]
    block_refs = events_ds.sort(["ts", "event_id"]).to_arrow_refs()
    feeds = [_feed_block.remote(seq, ref, actors, num_buckets)
             for seq, ref in enumerate(block_refs)]
    ray.get(feeds)
    closed = [row for a in actors for row in ray.get(a.drain.remote())]
    for a in actors:
        ray.kill(a)
    out = pd.DataFrame(closed, columns=["user_id", "session_start",
                                        "n_events", "duration_s"])
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["user_id", "session_start"]).reset_index(drop=True)

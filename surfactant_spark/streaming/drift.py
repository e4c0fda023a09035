"""Streaming capture drift: the stateful-stream twin of
operators/temporal.capture_drift (batch).

Each arriving capture of a url is SimHash-fingerprinted and compared
to the url's previous capture; the hamming distance is the recrawl /
change-detection signal, now available per micro-batch instead of per
archive rebuild.  Out-of-order arrivals inside the watermark horizon
are handled the same way sessions.py handles them: state buffers the
not-yet-final chain region and re-resolves predecessor order on every
invocation, so a late capture that lands BETWEEN two already-seen ones
re-chains them exactly as the batch lag window would have.

A drift row (prev → cur) is final once ``cur.ts < watermark``: admitted
events always have ts >= watermark, so nothing can insert below cur
anymore.  State keeps the buffered region plus the last finalized
fingerprint (the chain head) — bounded by the watermark horizon per
url.

Fingerprint parity: ``py_simhash64`` replicates dedup.simhash64
bit-for-bit (distinct lowercased alnum tokens, md5 hex chars 1-8 / 9-16
per 32-bit half, majority vote with >= tie rule); equality against the
Spark aggregate is asserted over real corpus rows in
tests/test_stream_drift.py, and stream ≡ batch on the finalized region.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_TOKEN_RX = re.compile(r"[a-z0-9]+")

DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("capture_id", T.LongType()),
        T.StructField("capture_ts", T.TimestampType()),
        T.StructField("drift_bits", T.LongType()),
    ]
)

# buffered not-yet-final captures (parallel arrays) + finalized chain
# head (nullable scalars)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("cid", T.ArrayType(T.LongType())),
        T.StructField("hi", T.ArrayType(T.LongType())),
        T.StructField("lo", T.ArrayType(T.LongType())),
        T.StructField("head_hi", T.LongType()),
        T.StructField("head_lo", T.LongType()),
    ]
)


def py_simhash64(text: str) -> tuple[int, int] | None:
    """Pure-Python replica of dedup.simhash64 for one document; None
    when the document has no tokens (the batch aggregate emits no row
    there, so the capture drops out of the drift chain)."""
    toks = set(_TOKEN_RX.findall(text.lower()))
    n = len(toks)
    if n == 0:
        return None
    cnt = [0] * 64  # 0-31 = hi bits, 32-63 = lo bits
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        hhi, hlo = int(h[:8], 16), int(h[8:16], 16)
        for i in range(32):
            cnt[i] += (hhi >> i) & 1
            cnt[32 + i] += (hlo >> i) & 1
    hi = sum(1 << i for i in range(32) if cnt[i] * 2 >= n)
    lo = sum(1 << i for i in range(32) if cnt[32 + i] * 2 >= n)
    return hi, lo


def _hamming(a_hi: int, a_lo: int, b_hi: int, b_lo: int) -> int:
    return bin(a_hi ^ b_hi).count("1") + bin(a_lo ^ b_lo).count("1")


def _drift_fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    buf: list[tuple[int, int, int, int]] = []  # (ts_us, cid, hi, lo)
    head: tuple[int, int] | None = None
    if state.exists:
        ts_us, cid, hi, lo, head_hi, head_lo = state.get
        buf.extend(zip(ts_us, cid, hi, lo))
        if head_hi is not None:
            head = (head_hi, head_lo)
    if not state.hasTimedOut:
        for pdf in pdf_iter:
            for ts, c, tx in zip(pdf["capture_ts"], pdf["capture_id"], pdf["text"]):
                fp = py_simhash64(tx if tx is not None else "")
                if fp is None:
                    continue  # token-less capture: not in the chain
                buf.append((int(ts.value // 1_000), int(c), fp[0], fp[1]))
    if not buf:
        if head is not None:
            # A finalized chain HEAD with no buffered region must
            # survive: a micro-batch whose captures were all
            # token-less (py_simhash64 None) lands here, and removing
            # the state would orphan the url's next real capture —
            # its drift row would silently vanish, diverging from
            # batch capture_drift, which chains across token-less
            # captures (r7 fix; the old code removed the state
            # whenever buf was empty).  Re-persist the head with no
            # pending region; no timeout is re-armed — a head-only
            # entry is the stream's memory of the last emitted
            # capture and must outlive any watermark gap, exactly as
            # the batch lag() does.
            state.update(([], [], [], [], head[0], head[1]))
        elif state.exists:
            state.remove()
        return
    buf.sort()
    wm_us = state.getCurrentWatermarkMs() * 1000
    out = []
    prev = head
    n_final = 0
    for ts_us_i, cid_i, hi_i, lo_i in buf:
        if ts_us_i >= wm_us:
            break
        if prev is not None:
            out.append(
                (
                    key[0],
                    cid_i,
                    pd.Timestamp(ts_us_i, unit="us"),
                    _hamming(prev[0], prev[1], hi_i, lo_i),
                )
            )
        prev = (hi_i, lo_i)
        n_final += 1
    kept = buf[n_final:]
    if kept or prev is not None:
        state.update(
            (
                [b[0] for b in kept],
                [b[1] for b in kept],
                [b[2] for b in kept],
                [b[3] for b in kept],
                prev[0] if prev is not None else None,
                prev[1] if prev is not None else None,
            )
        )
        if kept:
            state.setTimeoutTimestamp(
                max(kept[0][0] // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )
    elif state.exists:
        state.remove()
    if out:
        yield pd.DataFrame(
            out, columns=["url", "capture_id", "capture_ts", "drift_bits"]
        )


def capture_drift_stream(
    captures: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming captures(url, capture_id, capture_ts, text) → drift
    rows (url, capture_id, capture_ts, drift_bits), append mode; each
    row final once emitted."""
    return (
        captures.withWatermark("capture_ts", watermark)
        .groupBy("url")
        .applyInPandasWithState(
            _drift_fn,
            outputStructType=DRIFT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

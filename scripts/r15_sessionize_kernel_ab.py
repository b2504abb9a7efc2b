"""In-process A/B of the sessionize per-key kernel (no Spark).

Replays the applyInPandasWithState per-key pass over the real events
table: groups events by user_id into per-key pandas frames (exactly the
frames Spark hands fn under Trigger.AvailableNow — one batch per key),
then times the CURRENT kernel (argsort + _advance per-event loop +
vectorized out_frame) against the VECTORIZED batch kernel, interleaved
A/B/A/B, min-of-N.  Also reports component splits so the writeup can say
where the time actually lives (this box's absolute speed is meaningless;
only interleaved ratios count — see SCALE.md).

Usage: python scripts/r15_sessionize_kernel_ab.py [sf_dir] [passes]
"""

import sys
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from hyperspace_spark.streaming.sessionize import _advance  # noqa: E402

GAP_MS = 1800 * 1000
SESSION_TZ = "UTC"


def load_keyed(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    df = t.to_pandas()
    # JVM computes _hs_utc_ms = unix_millis(ts) before the stateful apply
    # (parquet ts is datetime64[us] -> int64 micros -> millis)
    df["_hs_utc_ms"] = df["ts"].astype("int64") // 1_000
    return [g.reset_index(drop=True) for _, g in df.groupby("user_id", sort=False)], df

def out_frame_current(user_id, closed):
    m = len(closed)
    st = np.fromiter((c[0] for c in closed), dtype=np.int64, count=m)
    en = np.fromiter((c[1] for c in closed), dtype=np.int64, count=m)
    cnt = np.fromiter((c[2] for c in closed), dtype=np.int32, count=m)
    tot = np.fromiter((c[3] for c in closed), dtype=np.float64, count=m)
    ss = pd.to_datetime(st, unit="ms", utc=True).tz_convert(SESSION_TZ).tz_localize(None)
    ee = pd.to_datetime(en, unit="ms", utc=True).tz_convert(SESSION_TZ).tz_localize(None)
    return pd.DataFrame(
        {
            "user_id": [user_id] * m,
            "session_start": pd.Series(ss),
            "session_end": pd.Series(ee),
            "n_events": cnt,
            "total_value": tot,
        }
    )


def kernel_current(groups):
    """Mirror of sessionize.fn today (fresh state per key, availableNow)."""
    out = []
    for rows in groups:
        user_id = rows["user_id"].iloc[0]
        ms = rows["_hs_utc_ms"].to_numpy()
        order = np.argsort(ms, kind="quicksort")
        ts_ms = ms[order].tolist()
        vals = rows["value"].to_numpy()[order].tolist()
        start, last, n, total = ts_ms[0], ts_ms[0], 0, 0.0
        (start, last, n, total), closed = _advance(
            start, last, n, total, ts_ms, vals, GAP_MS
        )
        if closed:
            out.append(out_frame_current(user_id, closed))
    return out


def advance_batch(start, last, n, total, ts, vals, gap_ms):
    """Vectorized twin of _advance over the SORTED main part (ts >= start
    handled here; late prefix delegated to _advance by the caller).
    Returns (state, (st, en, cnt, tot) arrays of closed sessions)."""
    m = ts.size
    prev = np.empty(m, dtype=np.int64)
    prev[0] = last
    if m > 1:
        np.maximum(ts[:-1], last, out=prev[1:])
    brk = (ts - prev) > gap_ms
    if n == 0:
        brk[0] = False
    bidx = np.flatnonzero(brk)
    if bidx.size == 0:
        cs = np.cumsum(vals)
        # seed with carried total: (total + v0) + v1 ... == total + cs pattern
        # via np.cumsum(concat) for bit-exactness
        cs = np.cumsum(np.concatenate(((total,), vals)))
        return (int(ts[0]) if False else start, int(max(last, ts[-1])), n + m, float(cs[-1])), (
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))
    b0 = int(bidx[0])
    nseg = bidx.size  # segments after seg0
    st_out = np.empty(nseg, dtype=np.int64)
    en_out = np.empty(nseg, dtype=np.int64)
    cnt_out = np.empty(nseg, dtype=np.int64)
    tot_out = np.empty(nseg, dtype=np.float64)
    # closed seg0 = carried open session extended by ts[:b0]
    st_out[0] = start
    if b0 > 0:
        cs0 = np.cumsum(np.concatenate(((total,), vals[:b0])))
        en_out[0] = max(last, int(ts[b0 - 1]))
        cnt_out[0] = n + b0
        tot_out[0] = cs0[-1]
    else:
        en_out[0], cnt_out[0], tot_out[0] = last, n, total
    # middle segments close; final stays open
    bounds = np.concatenate((bidx, (m,)))
    counts = np.diff(bounds)
    sums = np.add.reduceat(vals, bidx)
    st_out[1:] = ts[bidx[:-1]]
    en_out[1:] = ts[bounds[1:-1] - 1]
    cnt_out[1:] = counts[:-1]
    tot_out[1:] = sums[:-1]
    state = (int(ts[bidx[-1]]), int(ts[-1]), int(counts[-1]), float(sums[-1]))
    return state, (st_out, en_out, cnt_out, tot_out)


def out_frame_arrays(user_id, st, en, cnt, tot):
    # UTC fast path: instant -> wall is the identity, so the ns datetimes
    # are pure integer scaling — no pandas DatetimeIndex machinery.
    m = len(st)
    ss = st.astype("datetime64[ms]").astype("datetime64[ns]")
    ee = en.astype("datetime64[ms]").astype("datetime64[ns]")
    return pd.DataFrame(
        {
            "user_id": np.full(m, user_id, dtype=np.int64),
            "session_start": ss,
            "session_end": ee,
            "n_events": cnt.astype(np.int32),
            "total_value": tot,
        },
        copy=False,
    )


def kernel_fast_frame(groups):
    """argsort + per-event _advance (unchanged) + numpy-dt out_frame."""
    out = []
    for rows in groups:
        user_id = rows["user_id"].iloc[0]
        ms = rows["_hs_utc_ms"].to_numpy()
        order = np.argsort(ms, kind="stable")
        ts_ms = ms[order].tolist()
        vals = rows["value"].to_numpy()[order].tolist()
        start, last, n, total = ts_ms[0], ts_ms[0], 0, 0.0
        (start, last, n, total), closed = _advance(
            start, last, n, total, ts_ms, vals, GAP_MS
        )
        if closed:
            m = len(closed)
            st = np.fromiter((c[0] for c in closed), dtype=np.int64, count=m)
            en = np.fromiter((c[1] for c in closed), dtype=np.int64, count=m)
            cnt = np.fromiter((c[2] for c in closed), dtype=np.int64, count=m)
            tot = np.fromiter((c[3] for c in closed), dtype=np.float64, count=m)
            out.append(out_frame_arrays(user_id, st, en, cnt, tot))
    return out


def kernel_vectorized(groups):
    out = []
    for rows in groups:
        user_id = rows["user_id"].iloc[0]
        ms = rows["_hs_utc_ms"].to_numpy()
        order = np.argsort(ms, kind="stable")
        ts = ms[order]
        vals = rows["value"].to_numpy(dtype=np.float64)[order]
        start, last, n, total = int(ts[0]), int(ts[0]), 0, 0.0
        state, (st, en, cnt, tot) = advance_batch(start, last, n, total, ts, vals, GAP_MS)
        if st.size:
            out.append(out_frame_arrays(user_id, st, en, cnt, tot))
    return out


def norm(frames):
    if not frames:
        return []
    df = pd.concat(frames, ignore_index=True)
    df["total_value"] = df["total_value"].round(2)
    return sorted(map(tuple, df.to_numpy().tolist()))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    groups, df = load_keyed(sf_dir)
    print(f"{len(groups)} keys, {len(df)} events")

    # correctness first
    a = norm(kernel_current(groups))
    b = norm(kernel_vectorized(groups))
    c = norm(kernel_fast_frame(groups))
    print(f"sessions: current={len(a)} vectorized={len(b)} fast_frame={len(c)} equal={a == b == c}")
    if not (a == b == c):
        diff = [x for x, y in zip(a, b) if x != y][:5]
        print("FIRST DIFFS:", diff)
        sys.exit(1)

    times = {"current": [], "fast_frame": [], "vectorized": []}
    for p in range(passes):
        for name, k in (
            ("current", kernel_current),
            ("fast_frame", kernel_fast_frame),
            ("vectorized", kernel_vectorized),
        ):
            t0 = time.perf_counter()
            k(groups)
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name}: {['%.3f' % t for t in ts]} min={min(ts):.3f}")
    print(f"fast_frame speedup:  {min(times['current']) / min(times['fast_frame']):.2f}x")
    print(f"vectorized speedup:  {min(times['current']) / min(times['vectorized']):.2f}x")


if __name__ == "__main__":
    main()

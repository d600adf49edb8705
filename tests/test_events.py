"""Event-stream rollups: batch operators vs pandas recomputation, and
the streaming twin vs the batch plan on identical input."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from communitydetection_jl_spark.operators.events import (
    props_stats,
    sessionize,
    windowed_counts,
)
from communitydetection_jl_spark.streaming.windows import run_stream_to_memory

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.read.parquet(EVENTS)


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(EVENTS)


def test_windowed_counts_match_pandas(spark, events_df, events_pd):
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6), r.n_users)
        for r in windowed_counts(events_df, 600).collect()
    }
    pdf = events_pd.assign(
        bucket=(events_pd.ts.astype("int64") // 10**6 // 600) * 600
    )
    exp = {
        (int(b), t): (len(g), round(g.value.sum(), 6), g.user_id.nunique())
        for (b, t), g in pdf.groupby(["bucket", "event_type"])
    }
    assert got == exp


def test_sessionize_matches_pandas(spark, events_df, events_pd):
    gap = 1800
    got = {
        (r.user_id, r.session_idx): (
            round(r.start_ts, 6), round(r.end_ts, 6), r.n_events,
            round(r.total_value, 6),
        )
        for r in sessionize(events_df, gap).collect()
    }
    exp = {}
    for uid, g in events_pd.sort_values(["ts", "event_id"]).groupby("user_id"):
        tse = g.ts.astype("int64") / 1e6  # parquet ts is timestamp[us]
        sess, last = 0, None
        bounds = []  # (sess_idx, start, end, n, val)
        for t, v in zip(tse, g.value):
            if last is None or t - last > gap:
                sess += 1
                bounds.append([sess, t, t, 0, 0.0])
            bounds[-1][2] = t
            bounds[-1][3] += 1
            bounds[-1][4] += v
            last = t
        for s, st, en, n, val in bounds:
            exp[(uid, s)] = (round(st, 6), round(en, 6), n, round(val, 6))
    assert got == exp
    # durations are consistent
    for r in sessionize(events_df, gap).collect():
        assert abs(r.duration - (r.end_ts - r.start_ts)) < 1e-9
        assert r.duration >= 0


def test_props_stats_match_pandas(spark, events_df, events_pd):
    got = {
        r.event_type: (r.n, round(r.avg_k, 6), r.max_k)
        for r in props_stats(events_df).collect()
    }
    ks = events_pd.props.map(lambda s: json.loads(s)["k"])
    exp = {
        t: (len(g), round(g.mean(), 6), g.max())
        for t, g in ks.groupby(events_pd.event_type)
    }
    assert got == exp


def test_streaming_equals_batch(spark, events_df, tmp_path):
    batch = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6), r.n_users)
        for r in windowed_counts(events_df, 600).collect()
    }
    # the file source wants a directory: stage the same parquet file
    # into one and let availableNow drain it
    import shutil
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(EVENTS, stream_dir / "part-000.parquet")
    stream = run_stream_to_memory(
        spark, str(stream_dir), width_sec=600, table="t_stream_windows",
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6),
                                         r.n_users_approx)
        for r in stream.collect()
    }
    assert set(got) == set(batch)
    for k, (n, v, approx_users) in got.items():
        bn, bv, bu = batch[k]
        assert (n, v) == (bn, bv)
        # HLL default rsd=0.05; windows here are tiny so it is near-exact
        assert abs(approx_users - bu) <= max(2, 0.2 * bu)

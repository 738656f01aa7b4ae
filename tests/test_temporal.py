"""Event-time operators (stages/temporal.py): tumbling windows, as-of
join, interval-join aggregate, sessionization — exact vs a pandas/
DuckDB oracle, plus the tie / strictness / emptiness semantics and
partitioning invariance the driver gate doesn't exercise."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pagerank_cuda_dynamic_ray.stages import temporal as TP

US_H = 3_600_000_000


def _events(n=2000, seed=3, users=25):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, users, n).astype(np.int64),
        "event_type": rng.choice(["click", "purchase", "view"], n),
        "value": rng.rand(n) * 100,
        "ts": (np.datetime64("2024-01-01", "us")
               + rng.randint(0, 20 * 86_400_000_000, n).astype("timedelta64[us]")),
    })
    # planted exact-tie pairs: a click AND a purchase at the same (user, ts)
    df.loc[0, ["user_id", "event_type"]] = [7, "purchase"]
    df.loc[1, ["user_id", "event_type"]] = [7, "click"]
    df.loc[1, "ts"] = df.loc[0, "ts"]
    # two clicks at the same (user, ts): tiebreak must pick max event_id
    df.loc[2, ["user_id", "event_type"]] = [7, "click"]
    df.loc[2, "ts"] = df.loc[0, "ts"]
    return df


@pytest.fixture(scope="module")
def ev():
    return _events()


@pytest.fixture(scope="module")
def con(ev):
    c = duckdb.connect()
    c.register("events", ev)
    return c


def _sides(ev, parts):
    ds = rd.from_pandas(ev).repartition(parts)
    return (ds.filter(expr="event_type == 'purchase'"),
            ds.filter(expr="event_type == 'click'"))


@pytest.mark.parametrize("parts", [1, 5])
def test_windowed_aggregate(ev, con, parts):
    ds = rd.from_pandas(ev).repartition(parts)
    got = (TP.windowed_aggregate(ds).to_pandas()
           .sort_values(["window_start", "event_type"]).reset_index(drop=True))
    want = con.sql("""
        SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS window_start,
               event_type, count(*)::BIGINT AS n_events,
               min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""").df()
    want["window_start"] = want["window_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got[want.columns], want)


@pytest.mark.parametrize("parts", [1, 5])
def test_hopping_window_aggregate(ev, con, parts):
    ds = rd.from_pandas(ev).repartition(parts)
    got = (TP.windowed_aggregate(ds, hop_us=6 * US_H).to_pandas()
           .sort_values(["window_start", "event_type"]).reset_index(drop=True))
    want = con.sql("""
        SELECT make_timestamp(((epoch_us(ts) // 21600000000) - r.i) * 21600000000)
                 AS window_start,
               event_type, count(*)::BIGINT AS n_events,
               min(value) AS min_value, max(value) AS max_value
        FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) r
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    want["window_start"] = want["window_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got[want.columns], want)
    # every event lands in exactly width/hop windows
    assert got["n_events"].sum() == 4 * len(ev)


def test_hopping_equals_tumbling_when_hop_is_width(ev):
    ds = rd.from_pandas(ev)
    a = (TP.windowed_aggregate(ds).to_pandas()
         .sort_values(["window_start", "event_type"]).reset_index(drop=True))
    b = (TP.windowed_aggregate(ds, hop_us=TP._US_DAY).to_pandas()
         .sort_values(["window_start", "event_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_hopping_rejects_nondivisible_hop(ev):
    with pytest.raises(ValueError):
        TP.windowed_aggregate(rd.from_pandas(ev), hop_us=7 * US_H)


@pytest.mark.parametrize("parts", [1, 5])
def test_asof_join_inner_ties(ev, con, parts):
    p, c = _sides(ev, parts)
    got = (TP.asof_join(p, c, key="user_id", ts="ts", lcols=["event_id"],
                        rcols=["event_id"], right_tiebreak="event_id")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = con.sql("""
        WITH p AS (SELECT * FROM events WHERE event_type='purchase'),
             c AS (SELECT * FROM events WHERE event_type='click')
        SELECT p.event_id, p.user_id, l.r__event_id
        FROM p, LATERAL (SELECT c.event_id AS r__event_id FROM c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) l
        ORDER BY p.event_id""").df()
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the planted tie: purchase 0 matches click 2 (max event_id at equal ts)
    assert int(got.loc[got.event_id == 0, "r__event_id"].iloc[0]) == 2


def test_asof_join_strict_excludes_equal_ts(ev, con):
    p, c = _sides(ev, 4)
    got = (TP.asof_join(p, c, key="user_id", ts="ts", lcols=["event_id"],
                        rcols=["event_id"], right_tiebreak="event_id", strict=True)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = con.sql("""
        WITH p AS (SELECT * FROM events WHERE event_type='purchase'),
             c AS (SELECT * FROM events WHERE event_type='click')
        SELECT p.event_id, l.r__event_id
        FROM p, LATERAL (SELECT c.event_id AS r__event_id FROM c
          WHERE c.user_id = p.user_id AND c.ts < p.ts
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) l
        ORDER BY p.event_id""").df()
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_asof_join_left_keeps_unmatched():
    p = rd.from_pandas(pd.DataFrame({
        "k": np.array([1, 2], np.int64),
        "t": np.array([100, 100], "datetime64[us]"),
        "event_id": np.array([10, 11], np.int64),
    }))
    c = rd.from_pandas(pd.DataFrame({
        "k": np.array([1], np.int64),
        "t": np.array([50], "datetime64[us]"),
        "event_id": np.array([5], np.int64),
    }))
    out = (TP.asof_join(p, c, key="k", ts="t", lcols=["event_id"],
                        rcols=["event_id"], how="left")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(out) == 2
    assert int(out.loc[out.k == 1, "r__event_id"].iloc[0]) == 5
    assert pd.isna(out.loc[out.k == 2, "r__event_id"].iloc[0])
    # inner drops the unmatched row; empty right side yields zero rows
    inner = TP.asof_join(p, c, key="k", ts="t", lcols=["event_id"],
                         rcols=["event_id"]).to_pandas()
    assert len(inner) == 1
    empty_r = c.filter(expr="k == 99")
    assert TP.asof_join(p, empty_r, key="k", ts="t", lcols=["event_id"],
                        rcols=["event_id"]).count() == 0


@pytest.mark.parametrize("parts", [1, 5])
def test_interval_join_agg(ev, con, parts):
    p, c = _sides(ev, parts)
    got = (TP.interval_join_agg(p, c, key="user_id", ts="ts", lcols=["event_id"],
                                lo_offset_us=-US_H, hi_offset_us=0)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = con.sql("""
        WITH p AS (SELECT * FROM events WHERE event_type='purchase'),
             c AS (SELECT * FROM events WHERE event_type='click')
        SELECT p.event_id,
               (SELECT count(*) FROM c WHERE c.user_id = p.user_id
                 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts)::BIGINT AS n_matches
        FROM p ORDER BY p.event_id""").df()
    pd.testing.assert_frame_equal(got[want.columns], want)
    # window edges are inclusive: the planted equal-ts clicks are counted
    assert int(got.loc[got.event_id == 0, "n_matches"].iloc[0]) >= 2


@pytest.mark.parametrize("parts", [1, 5])
def test_sessionize(ev, con, parts):
    ds = rd.from_pandas(ev).repartition(parts)
    got = (TP.sessionize(ds).to_pandas()
           .sort_values(["user_id", "session_seq"]).reset_index(drop=True))
    want = con.sql("""
        WITH x AS (SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END brk
               FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) sid FROM x)
        SELECT user_id, sid::BIGINT AS session_seq, min(ts) AS session_start,
               max(ts) AS session_end, count(*)::BIGINT AS n_events
        FROM y GROUP BY 1, 2 ORDER BY 1, 2""").df()
    for col in ("session_start", "session_end"):
        want[col] = want[col].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got[want.columns], want)
    # session boundary semantics: a gap of exactly 30 min stays merged
    one = rd.from_pandas(pd.DataFrame({
        "user_id": np.zeros(3, np.int64),
        "event_id": np.arange(3, dtype=np.int64),
        "ts": (np.datetime64("2024-01-01", "us")
               + np.array([0, 30 * 60_000_000, 30 * 60_000_000 + 1],
                          "timedelta64[us]")),
    }))
    s = TP.sessionize(one).to_pandas()
    assert len(s) == 1 and int(s["n_events"].iloc[0]) == 3


def test_ns_timestamp_unit_normalized(ev):
    """timestamp[ns] inputs (the pandas default) must behave exactly like
    timestamp[us]: gap/offset arithmetic is µs-denominated internally.
    Regression: a bare int64 cast leaked ns integers into µs math,
    splitting every session and shrinking interval windows 1000x."""
    ev_ns = ev.copy()
    ev_ns["ts"] = ev_ns["ts"].astype("datetime64[ns]")

    s_us = (TP.sessionize(rd.from_pandas(ev), gap_us=US_H).to_pandas()
            .sort_values(["user_id", "session_seq"]).reset_index(drop=True))
    s_ns = (TP.sessionize(rd.from_pandas(ev_ns), gap_us=US_H).to_pandas()
            .sort_values(["user_id", "session_seq"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(s_us, s_ns)

    l_us, r_us = _sides(ev, 3)
    l_ns, r_ns = _sides(ev_ns, 3)
    a_us = (TP.asof_join(l_us, r_us, "user_id", "ts", ["event_id"],
                         ["event_id"], right_tiebreak="event_id").to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    a_ns = (TP.asof_join(l_ns, r_ns, "user_id", "ts", ["event_id"],
                         ["event_id"], right_tiebreak="event_id").to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    # passthrough payload columns legitimately keep their source unit —
    # only the VALUES must agree
    a_ns["ts"] = a_ns["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(a_us, a_ns)

    i_us = (TP.interval_join_agg(l_us, r_us, "user_id", "ts", ["event_id"],
                                 lo_offset_us=-US_H).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    i_ns = (TP.interval_join_agg(l_ns, r_ns, "user_id", "ts", ["event_id"],
                                 lo_offset_us=-US_H).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(i_us, i_ns)


def test_asof_tiebreak_above_2_53_stays_exact():
    """int64 tiebreaks beyond float64's 2^53 integer range (64-bit hashed
    ids) must still pick the true max. Regression: a float64 round-trip
    folded 2^53 and 2^53+1 together, making the winner partition-order-
    dependent."""
    ts = np.datetime64("2024-01-01", "us")
    left = pd.DataFrame({"user_id": [1], "ts": [ts], "event_id": [0]})
    big = np.int64(2**53)
    right = pd.DataFrame({
        "user_id": [1, 1], "ts": [ts, ts],
        "event_id": [big, big + 1],
    })
    for order in ([0, 1], [1, 0]):
        got = TP.asof_join(
            rd.from_pandas(left), rd.from_pandas(right.iloc[order]),
            "user_id", "ts", ["event_id"], ["event_id"],
            right_tiebreak="event_id",
        ).to_pandas()
        assert got["r__event_id"].tolist() == [big + 1]


def test_asof_from_pandas_string_payload():
    """pandas-block inputs with object-dtype (string) columns must work —
    regression: _pa_types crashed on np.dtype('O') before any work."""
    ts = np.datetime64("2024-01-01", "us")
    left = pd.DataFrame({
        "user_id": [1], "ts": [ts + np.timedelta64(5, "s")],
        "event_id": [10], "note": ["hello"],
    })
    right = pd.DataFrame({
        "user_id": [1], "ts": [ts], "event_id": [3], "tag": ["world"]
    })
    got = TP.asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "user_id", "ts", ["event_id", "note"], ["event_id", "tag"],
    ).to_pandas()
    assert got["note"].tolist() == ["hello"]
    assert got["r__tag"].tolist() == ["world"]


@pytest.mark.parametrize("parts", [1, 7])
def test_rolling_sum(ev, con, parts):
    ds = rd.from_pandas(ev).repartition(parts)
    got = (TP.rolling_sum(ds, preceding=3).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    want = con.sql("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS roll_sum_c
        FROM events ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_sum_key_straddles_many_blocks():
    """One user's run spanning many tiny blocks with a window wider than
    a block: heads must chain through consecutive blocks' tails."""
    n = 60
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.repeat([5, 9], n // 2).astype(np.int64),
        "value": np.linspace(0.0, 10.0, n),
        "ts": (np.datetime64("2024-01-01", "us")
               + np.arange(n).astype("timedelta64[us]")),
    })
    got = (TP.rolling_sum(rd.from_pandas(df).repartition(15), preceding=7)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    c = duckdb.connect()
    c.register("e", df)
    want = c.sql("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS roll_sum_c
        FROM e ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("parts", [1, 7])
def test_running_total(ev, con, parts):
    ds = rd.from_pandas(ev).repartition(parts)
    got = (TP.running_total(ds).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    want = con.sql("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum_c
        FROM events ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_running_total_key_spans_whole_blocks():
    """A key whose run covers several entire blocks must chain carries
    through the middle blocks, not just adjacent ones."""
    n = 40
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.repeat([3, 8], n // 2).astype(np.int64),
        "value": np.full(n, 1.0),
        "ts": (np.datetime64("2024-01-01", "us")
               + np.arange(n).astype("timedelta64[us]")),
    })
    got = (TP.running_total(rd.from_pandas(df).repartition(10)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # user 3: 100, 200, ... 2000; user 8 restarts at 100
    want = np.concatenate([np.arange(1, 21), np.arange(1, 21)]) * 100
    assert got["run_sum_c"].to_numpy().tolist() == want.tolist()


@pytest.mark.parametrize("parts", [1, 7])
def test_lag_gap(ev, con, parts):
    ds = rd.from_pandas(ev).repartition(parts)
    got = (TP.lag_gap(ds).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    want = con.sql("""
        SELECT event_id, user_id,
               COALESCE(epoch_us(ts) - epoch_us(LAG(ts) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id)), -1)::BIGINT
                 AS gap_us
        FROM events ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lag_gap_single_row_blocks():
    """One-row blocks: each row is head AND tail; heads must still see
    the true predecessor through the sliver chain."""
    n = 12
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.array([1] * 6 + [2] * 6, dtype=np.int64),
        "ts": (np.datetime64("2024-01-01", "us")
               + (np.arange(n) ** 2).astype("timedelta64[us]")),
    })
    got = (TP.lag_gap(rd.from_pandas(df).repartition(12)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    t = (df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
    want = np.diff(t, prepend=t[0])
    want[[0, 6]] = -1
    assert got["gap_us"].to_numpy().tolist() == want.tolist()


@pytest.mark.parametrize("parts", [1, 5])
def test_funnel_greedy_min_time_semantics(parts):
    rng = np.random.RandomState(9)
    n, users = 3000, 30
    df = pd.DataFrame({
        "user_id": rng.randint(0, users, n).astype(np.int64),
        "event_type": rng.choice(["signup", "click", "purchase", "view"], n),
        "ts": (np.datetime64("2024-01-01", "us")
               + rng.randint(0, 10 * 86_400_000_000, n).astype("timedelta64[us]")),
    })
    # user 29: a click BEFORE any signup plus one after — the classic
    # trap where min-click-per-user would be wrong
    df.loc[df["user_id"] == 29, "event_type"] = "view"
    extra = pd.DataFrame({
        "user_id": np.array([29, 29, 29], dtype=np.int64),
        "event_type": ["click", "signup", "click"],
        "ts": np.array(["2024-01-01T00", "2024-01-02T00", "2024-01-03T00"],
                       dtype="datetime64[us]"),
    })
    df = pd.concat([df, extra], ignore_index=True)
    got = (TP.funnel(rd.from_pandas(df).repartition(parts),
                     ["signup", "click", "purchase"])
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    us = np.int64(1)
    epoch = np.datetime64("1970-01-01", "us")
    for u, sub in df.groupby("user_id"):
        tsu = ((sub["ts"].to_numpy() - epoch) / us).astype(np.int64)
        ty = sub["event_type"].to_numpy()
        t1 = tsu[ty == "signup"].min() if (ty == "signup").any() else -1
        m2 = (ty == "click") & (tsu > t1) if t1 != -1 else np.zeros(len(ty), bool)
        t2 = tsu[m2].min() if m2.any() else -1
        m3 = (ty == "purchase") & (tsu > t2) if t2 != -1 else np.zeros(len(ty), bool)
        t3 = tsu[m3].min() if m3.any() else -1
        row = got[got["user_id"] == u].iloc[0]
        assert (row["t_signup_us"], row["t_click_us"], row["t_purchase_us"]) == (t1, t2, t3), u
        assert row["stages_completed"] == sum(t != -1 for t in (t1, t2, t3))
    # the trap user completed signup -> later click
    trap = got[got["user_id"] == 29].iloc[0]
    assert trap["stages_completed"] == 2
    assert trap["t_click_us"] > trap["t_signup_us"]

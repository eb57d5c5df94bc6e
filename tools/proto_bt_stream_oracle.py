"""VALIDATED prototype for round 14's stream_bradley_terry oracle: the
two-batch warm-started MM fit (StreamingBradleyTerry's deterministic
even/odd event_id schedule) replayed in DuckDB as two nested
list_reduce folds, the second seeded by the first.

    python tools/proto_bt_stream_oracle.py   # prints MATCH: True

Validated this round (r13) against the plain-Python schedule replay —
the same fold the engine runs (see tests/test_round14_staging.py).
Key tricks, in registration order for the r14 session:

- ONE GLOBAL sorted item list (over the full log) aligns every stage's
  packed lists; per-stage wins pack via LEFT JOIN + coalesce(0).
- Stage folds carry a ``CASE WHEN denom = 0 THEN acc[i]`` branch:
  items absent from a stage's pair table keep their accumulator —
  which for stage 1's uniform init is EXACTLY the engine's
  new-items-enter-at-1e6 warm-start rule, so no special-casing.
- Same overflow-safe div/mod split and micro-rounded contributions as
  the batch oracle (catalog/ranking.py _bt_oracle).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
MICRO = 1_000_000
K = 4  # BT_STREAM_ITERATIONS


def _fold(iters: int, init_expr: str, suffix: str) -> str:
    """One warm-startable MM fold over packed lists with per-stage
    columns wins{s}/pa{s}/pb{s}/n{s}; denom=0 keeps the accumulator."""
    contrib = (
        f"CASE WHEN pa{suffix}[j] = i OR pb{suffix}[j] = i THEN"
        f" CAST(round(n{suffix}[j] * {MICRO}"
        f" / ((acc[pa{suffix}[j]] + acc[pb{suffix}[j]]) / {MICRO}.0)) AS BIGINT)"
        f" ELSE 0 END"
    )
    denom = (
        f"CAST(list_sum(list_transform(range(1, len(n{suffix}) + 1),"
        f" j -> {contrib})) AS BIGINT)"
    )
    return f"""
      list_reduce(
        list_prepend({init_expr},
                     list_transform(range(1, {iters} + 1),
                                    z -> CAST([] AS BIGINT[]))),
        (acc, x) -> list_transform(
          list_transform(range(1, len(items) + 1),
                         i -> [CAST(i AS BIGINT), {denom}]),
          d -> CASE WHEN d[2] = 0 THEN acc[d[1]] ELSE GREATEST(
            (wins{suffix}[d[1]] * {MICRO}) // d[2] * {MICRO}
              + CAST(round(((wins{suffix}[d[1]] * {MICRO}) % d[2])
                           / d[2] * {MICRO}) AS BIGINT),
            CAST(1 AS BIGINT)) END))"""


def _pairs_cte(name: str, where: str) -> str:
    return f"""{name} AS (
  SELECT least(winner, loser) AS item_a, greatest(winner, loser) AS item_b,
         CAST(sum(CASE WHEN winner < loser THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
         CAST(sum(CASE WHEN winner < loser THEN 0 ELSE 1 END) AS BIGINT) AS wins_b
  FROM comp {where} GROUP BY 1, 2)"""


def _packed_stage(s: str, pairs: str) -> str:
    pos = "(SELECT list(item ORDER BY item) FROM all_items)"
    return f"""
    (SELECT list(coalesce(w.wins, 0) ORDER BY a.item)
       FROM all_items a LEFT JOIN w{s} w USING (item)) AS wins{s},
    (SELECT list(list_position({pos}, item_a) ORDER BY item_a, item_b)
       FROM {pairs}) AS pa{s},
    (SELECT list(list_position({pos}, item_b) ORDER BY item_a, item_b)
       FROM {pairs}) AS pb{s},
    (SELECT list(wins_a + wins_b ORDER BY item_a, item_b) FROM {pairs}) AS n{s}"""


def oracle_sql() -> str:
    return f"""
WITH lagged AS (
  SELECT event_id, event_type, value,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS pt,
         lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
  FROM events
),
comp AS (
  SELECT event_id,
         CASE WHEN value > pv THEN event_type ELSE pt END AS winner,
         CASE WHEN value > pv THEN pt ELSE event_type END AS loser
  FROM lagged WHERE pt IS NOT NULL AND event_type <> pt AND value <> pv
),
{_pairs_cte('pairs1', 'WHERE event_id % 2 = 0')},
{_pairs_cte('pairs2', '')},
all_items AS (
  SELECT DISTINCT item FROM (
    SELECT item_a AS item FROM pairs2 UNION ALL SELECT item_b FROM pairs2) t
),
w1 AS (SELECT item, CAST(sum(w) AS BIGINT) AS wins FROM (
    SELECT item_a AS item, wins_a AS w FROM pairs1
    UNION ALL SELECT item_b, wins_b FROM pairs1) t GROUP BY 1),
w2 AS (SELECT item, CAST(sum(w) AS BIGINT) AS wins FROM (
    SELECT item_a AS item, wins_a AS w FROM pairs2
    UNION ALL SELECT item_b, wins_b FROM pairs2) t GROUP BY 1),
nc2 AS (SELECT item, CAST(sum(nc) AS BIGINT) AS ncomp FROM (
    SELECT item_a AS item, wins_a + wins_b AS nc FROM pairs2
    UNION ALL SELECT item_b, wins_a + wins_b FROM pairs2) t GROUP BY 1),
packed AS (
  SELECT
    (SELECT list(item ORDER BY item) FROM all_items) AS items,
    (SELECT list(coalesce(n.ncomp, 0) ORDER BY a.item)
       FROM all_items a LEFT JOIN nc2 n USING (item)) AS ncomp,
    {_packed_stage('1', 'pairs1')},
    {_packed_stage('2', 'pairs2')}
),
f1 AS (
  SELECT *,
  {_fold(K, f'list_transform(items, it -> CAST({MICRO} AS BIGINT))', '1')}
    AS p1 FROM packed
),
f2 AS (
  SELECT *, {_fold(K, 'p1', '2')} AS p2 FROM f1
),
normed AS (
  SELECT items, wins2, ncomp, p2,
         list_sum(list_transform(p2, v -> CAST(v AS DOUBLE))) / len(p2) AS m
  FROM f2
)
SELECT items[u.i] AS item,
       round(p2[u.i] / m * {MICRO}) / {MICRO} AS strength,
       wins2[u.i] AS n_wins, ncomp[u.i] AS n_comparisons
FROM normed, UNNEST(range(1, len(items) + 1)) AS u(i)
ORDER BY item
"""


def _half_up(x: float) -> int:
    return math.floor(x + 0.5)


def _py_replay(comp):
    def pairs_of(rows_):
        cum = {}
        for _, w, l in rows_:
            a, b = min(w, l), max(w, l)
            wa, wb = cum.get((a, b), (0, 0))
            if w == a:
                wa += 1
            else:
                wb += 1
            cum[(a, b)] = (wa, wb)
        return cum

    def py_mm(cum, init, iters):
        items = sorted({i for ab in cum for i in ab})
        wins = {i: 0 for i in items}
        for (a, b), (wa, wb) in cum.items():
            wins[a] += wa
            wins[b] += wb
        p = dict(init)
        for _ in range(iters):
            den = {i: 0 for i in items}
            for (a, b), (wa, wb) in cum.items():
                c = _half_up((wa + wb) * MICRO / ((p[a] + p[b]) / float(MICRO)))
                den[a] += c
                den[b] += c
            p = {
                i: max(
                    (wins[i] * MICRO) // den[i] * MICRO
                    + _half_up((wins[i] * MICRO) % den[i] / den[i] * MICRO),
                    1,
                )
                for i in items
            }
        return p

    b1 = [r for r in comp if r[0] % 2 == 0]
    cum1 = pairs_of(b1)
    p1 = py_mm(cum1, {i: MICRO for i in {x for ab in cum1 for x in ab}}, K)
    cum2 = pairs_of(comp)
    items2 = sorted({x for ab in cum2 for x in ab})
    p2 = py_mm(cum2, {i: p1.get(i, MICRO) for i in items2}, K)
    wins = {i: 0 for i in items2}
    ncomp = {i: 0 for i in items2}
    for (a, b), (wa, wb) in cum2.items():
        wins[a] += wa
        wins[b] += wb
        ncomp[a] += wa + wb
        ncomp[b] += wa + wb
    m = sum(float(v) for v in p2.values()) / len(items2)
    return [
        (i, _half_up(p2[i] / m * MICRO) / MICRO, wins[i], ncomp[i])
        for i in items2
    ]


def main() -> int:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    rows = [tuple(r) for r in con.execute(oracle_sql()).fetchall()]
    comp = con.execute("""
WITH lagged AS (
  SELECT event_id, event_type, value,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS pt,
         lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
  FROM events)
SELECT event_id,
       CASE WHEN value > pv THEN event_type ELSE pt END,
       CASE WHEN value > pv THEN pt ELSE event_type END
FROM lagged WHERE pt IS NOT NULL AND event_type <> pt AND value <> pv
""").fetchall()
    want = _py_replay(comp)
    print("oracle:", rows)
    print("python:", want)
    ok = rows == want
    print("MATCH:", ok)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Property-based metamorphic testing: random CDC histories (inserts,
updates, FK repoints, tombstones, re-adds) over a 3-entity tree must
produce identical documents from the Spark engine and the independent
pure-Python oracle — for the full changelog and for every prefix fed
incrementally through the IVM orchestrator.

This generalizes the reference's hand-written drip-feed E2E test
(SouthpawEndToEndTest) to arbitrary event interleavings.
"""

import json
import random

import pytest
from pyspark.sql import functions as F

import oracle as pyoracle
from southpaw_spark.operators.cdc import current_state, tombstoned_keys
from southpaw_spark.operators.denormalize import denormalize_to_json
from southpaw_spark.relations import load_relations

TREE = {
    "DenormalizedName": "D",
    "Entity": "parent",
    "Children": [
        {"Entity": "child", "JoinKey": "parent_id", "ParentKey": "id"},
        {
            "Entity": "link",
            "JoinKey": "parent_id",
            "ParentKey": "id",
            "Children": [
                {"Entity": "leaf", "JoinKey": "id", "ParentKey": "leaf_id"}
            ],
        },
    ],
}

KEYS = {
    "parent": ["id"],
    "child": ["cid"],
    "link": ["lid"],
    "leaf": ["id"],
}

SCHEMAS = {
    "parent": "seq long, id int, name string, is_tombstone boolean",
    "child": "seq long, cid int, parent_id int, tag string, is_tombstone boolean",
    "link": "seq long, lid int, parent_id int, leaf_id int, is_tombstone boolean",
    "leaf": "seq long, id int, label string, is_tombstone boolean",
}


def gen_history(rng: random.Random, n_events: int):
    """Random interleaved changelogs with deliberate edge cases: NULL
    FKs, dangling FKs, repoints, tombstone→re-add."""
    logs = {e: [] for e in SCHEMAS}
    seq = 0
    parents = list(range(1, 6))
    leaves = list(range(100, 105))
    for _ in range(n_events):
        seq += 1
        entity = rng.choice(["parent", "child", "link", "leaf", "parent", "child"])
        tomb = rng.random() < 0.15
        if entity == "parent":
            pid = rng.choice(parents)
            logs["parent"].append(
                (seq, pid, None, True)
                if tomb
                else (seq, pid, f"p{seq}", False)
            )
        elif entity == "child":
            cid = rng.randint(1, 8)
            # NULL FK 10% | dangling FK 10% | live parent
            r = rng.random()
            fk = None if r < 0.1 else (99 if r < 0.2 else rng.choice(parents))
            logs["child"].append(
                (seq, cid, None, None, True)
                if tomb
                else (seq, cid, fk, f"t{seq}", False)
            )
        elif entity == "link":
            lid = rng.randint(1, 6)
            fk = rng.choice(parents)
            leaf = rng.choice(leaves + [999])  # sometimes dangling leaf
            logs["link"].append(
                (seq, lid, None, None, True)
                if tomb
                else (seq, lid, fk, leaf, False)
            )
        else:
            lf = rng.choice(leaves)
            logs["leaf"].append(
                (seq, lf, None, True) if tomb else (seq, lf, f"L{seq}", False)
            )
    return logs


def spark_docs(spark, logs):
    frames = {
        e: spark.createDataFrame(rows or [], SCHEMAS[e])
        for e, rows in logs.items()
    }
    rel = load_relations([TREE])[0]
    states = {e: current_state(df, KEYS[e]) for e, df in frames.items()}
    dead = tombstoned_keys(frames["parent"], ["id"])
    out = denormalize_to_json(states, rel, KEYS, tombstoned_roots=dead)
    return {
        (r["id"],): None if r["value"] is None else json.loads(r["value"])
        for r in out.collect()
    }


def oracle_docs(logs):
    cols = {
        e: [c.split()[0] for c in SCHEMAS[e].split(", ")] for e in SCHEMAS
    }
    rows = {
        e: [dict(zip(cols[e], r)) for r in evs] for e, evs in logs.items()
    }
    return pyoracle.denormalize(rows, KEYS, TREE, {})


@pytest.mark.parametrize("trial_seed", [11, 23, 37, 59])
def test_random_history_matches_oracle(spark, trial_seed):
    rng = random.Random(trial_seed)
    logs = gen_history(rng, n_events=60)
    got = spark_docs(spark, logs)
    want = oracle_docs(logs)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (
            f"seed {trial_seed} root {k}:\n"
            f"spark : {json.dumps(got[k], sort_keys=True)}\n"
            f"oracle: {json.dumps(want[k], sort_keys=True)}"
        )


def test_random_history_incremental(spark, tmp_path):
    """Feed a random history through the IVM in 4 micro-batches; the
    accumulated latest-per-root output must match the oracle."""
    from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore

    rng = random.Random(101)
    logs = gen_history(rng, n_events=48)
    frames = {
        e: spark.createDataFrame(rows or [], SCHEMAS[e])
        for e, rows in logs.items()
    }
    rel = load_relations([TREE])
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    ivm = IncrementalDenormalizer(
        spark=spark, relations=rel, keys=KEYS, store=store
    )
    ivm.bootstrap(
        {e: df.where("seq < 0").drop("seq", "is_tombstone") for e, df in frames.items()}
    )
    acc = {}
    for lo, hi in [(0, 12), (12, 24), (24, 36), (36, 48)]:
        deltas = {
            e: df.where((F.col("seq") > lo) & (F.col("seq") <= hi))
            for e, df in frames.items()
        }
        deltas = {e: d for e, d in deltas.items() if d.count() > 0}
        for name, out in ivm.process_batch(deltas).items():
            for r in out.collect():
                acc[(r["id"],)] = (
                    None if r["value"] is None else json.loads(r["value"])
                )
    want = oracle_docs(logs)
    for k, doc in want.items():
        assert acc.get(k, "MISSING") == doc, f"root {k}"
    for k, doc in acc.items():
        if k not in want:
            assert doc is None


def test_engagement_ops_match_python_brute_force(spark):
    """Random activity logs: funnel (e13), cohort_retention (a11) and
    rolling_active_users (e14) each equal an independent brute-force
    Python computation — the distributed fan-out/agg shapes cannot
    diverge from the direct definitions on any random interleaving."""
    from southpaw_spark.operators.skew import (
        cohort_retention,
        rolling_active_users,
    )
    from southpaw_spark.operators.temporal import funnel

    rng = random.Random(90920)
    for trial in range(3):
        rows = [
            (
                rng.randint(1, 12),
                rng.choice(["view", "click", "purchase", "other"]),
                rng.randint(0, 30),
            )
            for _ in range(rng.randint(30, 120))
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts long"
        )

        # --- funnel brute force
        steps = ["view", "click", "purchase"]
        by_user: dict = {}
        for u, t, ts in rows:
            by_user.setdefault(u, []).append((ts, t))
        reached = [0] * len(steps)
        for evs in by_user.values():
            prev = None
            for k, s in enumerate(steps):
                cand = [
                    ts
                    for ts, t in evs
                    if t == s and (prev is None or ts > prev)
                ]
                if not cand:
                    break
                prev = min(cand)
                reached[k] += 1
        got_f = {
            r["step"]: r["n_users"]
            for r in funnel(
                df, "user_id", "event_type", "ts", steps
            ).collect()
        }
        assert got_f == {
            k + 1: n for k, n in enumerate(reached)
        }, (trial, rows)

        # --- cohort retention brute force (period = ts)
        first = {u: min(ts for ts, _ in evs) for u, evs in by_user.items()}
        cells: dict = {}
        for u, evs in by_user.items():
            for p in {ts for ts, _ in evs}:
                key = (first[u], p - first[u])
                cells[key] = cells.get(key, 0) + 1
        got_c = {
            (r["cohort"], r["offset"]): r["n_active"]
            for r in cohort_retention(df, "user_id", "ts").collect()
        }
        assert got_c == cells, trial

        # --- rolling active brute force (window=5)
        ud = {(u, ts) for u, _, ts in rows}
        days = sorted({ts for _, ts in ud})
        expect = {}
        for d in days:
            dau = len({u for u, ts in ud if ts == d})
            roll = len({u for u, ts in ud if d - 4 <= ts <= d})
            expect[d] = (dau, roll)
        got_r = {
            r["period"]: (r["dau"], r["rolling_active"])
            for r in rolling_active_users(
                df, "user_id", "ts", window=5
            ).collect()
        }
        assert got_r == expect, trial


def test_line_dedup_matches_python_brute_force(spark):
    """Random corpora from a tiny line alphabet: duplicate_lines and
    remove_duplicate_lines must equal an independent pure-Python
    reference, for several min_count values, and be invariant to row
    order/partitioning."""
    from southpaw_spark.operators.dedup import (
        duplicate_lines,
        remove_duplicate_lines,
    )

    rng = random.Random(1107)
    alphabet = [
        "cookie banner", "nav home", "",  # empties never flag
        "real prose alpha", "real prose beta", "footer text",
    ]
    for trial in range(3):
        docs = []
        for i in range(30):
            n = rng.randint(1, 6)
            docs.append(
                (i, "\n".join(rng.choice(alphabet) for _ in range(n)))
            )
        for mc in (2, 3, 5):
            # pure-Python reference
            from collections import Counter

            counts = Counter(
                ln for _, t in docs for ln in t.split("\n") if ln != ""
            )
            dup = {ln for ln, c in counts.items() if c >= mc}
            want_inv = {ln: c for ln, c in counts.items() if c >= mc}
            want = {}
            for i, t in docs:
                lines = t.split("\n")
                kept = [ln for ln in lines if ln == "" or ln not in dup]
                clean = "\n".join(kept)
                ntoks = 0 if clean == "" else len(clean.split(" "))
                want[i] = (clean, len(lines), len(kept), ntoks)

            sdf = spark.createDataFrame(
                docs, "doc_id long, text string"
            ).repartition(7).sortWithinPartitions(
                F.col("doc_id").desc()
            )
            got_inv = {
                r["line"]: r["n_occurrences"]
                for r in duplicate_lines(
                    sdf, "text", "doc_id", min_count=mc
                ).collect()
            }
            assert got_inv == want_inv, (trial, mc)
            got = {
                r["doc_id"]: (
                    r["text_clean"], r["n_lines_before"],
                    r["n_lines_after"], r["n_tokens_after"],
                )
                for r in remove_duplicate_lines(
                    sdf, "text", "doc_id", min_count=mc
                ).collect()
            }
            assert got == want, (trial, mc)


def test_blocklist_list_dataframe_parity_fuzz(spark):
    """Random hosts × random blocklists: the codegen list form and the
    broadcast-join DataFrame form must flag the identical doc set, and
    both must equal a pure-Python suffix-chain reference."""
    from southpaw_spark.operators.text import (
        blocklist_filter,
        blocklist_hits,
    )

    rng = random.Random(2411)
    labels = ["a", "bb", "ccc", "www", "spam", "ok"]
    tlds = ["com", "net", "org"]

    def host(rng):
        n = rng.randint(1, 4)
        return ".".join(
            [rng.choice(labels) for _ in range(n)] + [rng.choice(tlds)]
        )

    for trial in range(3):
        docs = [
            (i, f"https://{host(rng)}:{rng.choice(['', '8080'])or '443'}/p")
            for i in range(40)
        ]
        # r11-ADVICE: NULL urls must survive BOTH filter arms (and
        # never appear in hits) — fold a couple into every trial
        docs += [(40, None), (41, None)]
        blocked = list({host(rng) for _ in range(4)})
        sdf = spark.createDataFrame(docs, "doc_id long, url string")
        bdf = spark.createDataFrame([(b,) for b in blocked], "h string")

        def suffixes(h):
            parts = h.split(".")
            return {".".join(parts[i:]) for i in range(len(parts))}

        want_blocked = set()
        for i, u in docs:
            if u is None:
                continue  # no host evidence -> never blocked
            h = u.split("://")[1].split("/")[0].split(":")[0].lower()
            if suffixes(h) & set(blocked):
                want_blocked.add(i)

        got_list = {
            r["doc_id"]
            for r in blocklist_hits(sdf, "url", "doc_id", blocked)
            .select("doc_id").distinct().collect()
        }
        got_df = {
            r["doc_id"]
            for r in blocklist_hits(sdf, "url", "doc_id", bdf)
            .select("doc_id").distinct().collect()
        }
        assert got_list == got_df == want_blocked, trial
        kept = {
            r["doc_id"]
            for r in blocklist_filter(
                sdf, "url", "doc_id", blocked
            ).collect()
        }
        assert kept == {i for i, _ in docs} - want_blocked, trial

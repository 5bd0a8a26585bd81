"""CLI lifecycle (--build/--verify-state/--backup/--restore), state
backup/restore, and the O12 queueing-strategy hook."""

import json

import yaml
from pyspark.sql import functions as F

from southpaw_spark import cli
from southpaw_spark.relations import load_relations
from southpaw_spark.streaming import IncrementalDenormalizer, ParquetStateStore
from southpaw_spark.testing import RELATION_TREES, changelog_frames, entity_keys


def _write_cfg(tmp_path, sf_dir):
    relations = [
        {
            "DenormalizedName": "DenormalizedOrder",
            "Entity": "orders",
            "Children": [
                {"Entity": "customer", "JoinKey": "c_custkey", "ParentKey": "o_custkey"}
            ],
        }
    ]
    (tmp_path / "relations.json").write_text(json.dumps(relations))
    cfg = {
        "state.dir": str(tmp_path / "state"),
        "relations": str(tmp_path / "relations.json"),
        "output.dir": str(tmp_path / "out"),
        "entities": {
            "orders": {
                "keys": ["o_orderkey"],
                "snapshot": f"{sf_dir}/orders.parquet",
            },
            "customer": {
                "keys": ["c_custkey"],
                "snapshot": f"{sf_dir}/customer.parquet",
            },
        },
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_cli_build_and_backup_restore(spark, tmp_path, sf_dir):
    cfg = _write_cfg(tmp_path, sf_dir)
    assert cli.main(["--config", str(cfg), "--build"]) == 0
    out = spark.read.parquet(str(tmp_path / "out" / "DenormalizedOrder"))
    assert out.count() == 1500
    doc = json.loads(out.where("o_orderkey = 7").collect()[0]["value"])
    assert doc["Children"]["customer"][0]["Record"]["c_custkey"] == 93

    assert cli.main(["--config", str(cfg), "--backup", str(tmp_path / "bk")]) == 0
    backups = list((tmp_path / "bk").iterdir())
    assert len(backups) == 1
    assert cli.main(["--config", str(cfg), "--delete-state"]) == 0
    store = ParquetStateStore(spark, str(tmp_path / "state"))
    assert not store.exists("orders")
    assert cli.main(["--config", str(cfg), "--restore", str(backups[0])]) == 0
    assert store.read("orders").count() == 1500
    # when_needed must now skip (state present)
    assert store.restore(str(backups[0]), mode="when_needed") is False
    # --delete-backups clears snapshots but never live state (hardlinks)
    assert cli.main(["--config", str(cfg), "--delete-backups",
                     str(tmp_path / "bk")]) == 0
    assert list((tmp_path / "bk").iterdir()) == []
    assert store.read("orders").count() == 1500


def test_queueing_strategy_none_drops(spark, tmp_path):
    logs = changelog_frames(spark)
    keys = entity_keys()
    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    # user_tag → NONE mirrors the reference test config
    ivm = IncrementalDenormalizer(
        spark=spark,
        relations=load_relations([RELATION_TREES[0]]),
        keys=keys,
        store=store,
        queueing_strategy=lambda tree, entity: (
            "none" if entity == "user_tag" else "high"
        ),
    )
    ivm.bootstrap(
        {e: logs[e].where("seq < 0").drop("seq", "is_tombstone") for e in keys}
    )
    ivm.process_batch({e: logs[e].where("seq <= 29") for e in keys})
    # a user_tag-only change produces no rebuilds (dropped by strategy)
    outs = ivm.process_batch({"user_tag": logs["user_tag"].where("seq = 8")})
    assert "DenormalizedPlaylist" not in outs or outs[
        "DenormalizedPlaylist"
    ].count() == 0


def test_cli_vacuum_bounds_versions(spark, tmp_path):
    import os

    store = ParquetStateStore(spark, str(tmp_path / "state"), n_buckets=4)
    rows = spark.createDataFrame([(1, "a")], "id long, val string")
    store.init("e", rows, ["id"])
    for i in range(4):
        store.merge(
            "e",
            spark.createDataFrame([(1, f"v{i}")], "id long, val string"),
            None, ["id"],
        )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"state.dir: {tmp_path / 'state'}\n")
    assert cli.main(
        ["--config", str(cfg), "--vacuum", "--keep-versions", "2"]
    ) == 0
    vdirs = [n for n in os.listdir(tmp_path / "state" / "e")
             if n.startswith("v") and n[1:].isdigit()]
    assert len(vdirs) == 2, vdirs
    assert store.read("e").collect()[0]["val"] == "v3"


def test_cli_stream_consume_loop(spark, tmp_path):
    """--stream: the continuous consume loop over a file replay of the
    CDC frame — docs land in the stream output dir and reflect the
    replayed user events (reference run(runTimeMS) shape)."""
    from southpaw_spark.testing import CHANGELOG_EVENTS, ENTITY_SCHEMAS

    relations = [RELATION_TREES[1]]  # DenormalizedPlayer
    (tmp_path / "relations.json").write_text(json.dumps(relations))
    logs = changelog_frames(spark)
    keys = entity_keys()
    # snapshots on disk: players full, users empty
    logs["player"].drop("seq", "is_tombstone").write.parquet(
        str(tmp_path / "player_snap")
    )
    logs["user"].where("seq < 0").drop("seq", "is_tombstone").write.parquet(
        str(tmp_path / "user_snap")
    )
    src = tmp_path / "frames"
    src.mkdir()
    user_schema, _ = ENTITY_SCHEMAS["user"]
    cols = [c.split()[0] for c in user_schema.split(", ")]
    events = [
        dict(zip(cols, ev), entity="user") for ev in CHANGELOG_EVENTS["user"]
    ]
    (src / "a.json").write_text("\n".join(json.dumps(e) for e in events))
    cfg = {
        "state.dir": str(tmp_path / "state"),
        "relations": str(tmp_path / "relations.json"),
        "output.dir": str(tmp_path / "out"),
        "entities": {
            "player": {"keys": keys["player"],
                       "snapshot": str(tmp_path / "player_snap")},
            "user": {"keys": keys["user"],
                     "snapshot": str(tmp_path / "user_snap"),
                     "columns": cols},
        },
        "stream": {
            "source.dir": str(src),
            "format": "json",
            "schema": user_schema + ", entity string",
            "entity.col": "entity",
            "checkpoint.dir": str(tmp_path / "ckpt"),
            "output.dir": str(tmp_path / "stream_out"),
            # Prometheus /metrics endpoint for the run's lifetime (the
            # reference's JmxReporter analog); 0 = ephemeral port. The
            # scrape itself is pinned by the MetricsHttpExporter unit
            # test — here we pin the CLI wiring + clean shutdown.
            "metrics.port": 0,
        },
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    assert cli.main(["--config", str(p), "--stream",
                     "--run-time-s", "20"]) == 0
    out = spark.read.parquet(str(tmp_path / "stream_out" / "DenormalizedPlayer"))
    docs = {r["id"]: r["value"] for r in out.collect()}
    doc = json.loads(docs[800])
    assert [u["Record"]["user_name"] for u in doc["Children"]["user"]] == [
        "alice2"
    ]


def test_cli_build_corpus(spark, tmp_path, capsys):
    """--build-corpus runs the pipeline from the corpus: config block
    (span dedup + token budget + shuffled export) and the shipped
    shards concatenate to the full deterministic permutation of the
    survivors."""
    import glob

    import pyarrow.parquet as pq

    cfg = {
        "corpus": {
            "input": "/root/testdata/sf0.001/documents.parquet",
            "text_col": "text",
            "id_col": "doc_id",
            "min_tokens": 5,
            "exact_dedup": True,
            "span_dedup_k": 8,
            "output": str(tmp_path / "corpus_out"),
            "shuffle_shards": 4,
            "shuffle_salt": "epoch0",
        }
    }
    cfg_path = tmp_path / "corpus.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    rc = cli.main(["--config", str(cfg_path), "--build-corpus"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "input:" in out and "span_dedup:" in out and "corpus ->" in out
    files = sorted(glob.glob(str(tmp_path / "corpus_out" / "part-*.parquet")))
    assert files
    ids = []
    for f in files:
        ids += pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
    assert len(ids) == len(set(ids)) > 0
    # deterministic shuffle: the same permutation as shuffled_shards
    from southpaw_spark.operators.text import shuffled_shards
    from southpaw_spark.pipelines import build_corpus

    kept, _ = build_corpus(
        spark.read.parquet(cfg["corpus"]["input"]),
        min_tokens=5, exact_dedup=True, span_dedup_k=8,
        collect_report=False,
    )
    want = [
        r["doc_id"]
        for r in shuffled_shards(kept, "doc_id", 4, salt="epoch0")
        .orderBy("shard", "pos").collect()
    ]
    assert ids == want


def test_cli_corpus_stream_cron_shaped(spark, tmp_path):
    """corpus.stream: true — two cron-shaped invocations on the same
    state/checkpoint: the first drains the landed files; the second
    sees only newly landed ones and its cross-INVOCATION exact
    duplicate is dropped against the persistent state; bad
    input_format fails loudly."""
    import json as _json

    import pytest as _pytest

    from southpaw_spark.cli import build_corpus_cmd

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    cfg = {
        "corpus": {
            "stream": True,
            "input": str(src),
            "input_format": "json",
            "state_dir": str(tmp_path / "state"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "output": str(out),
            "min_tokens": 3,
            "state_buckets": 4,
            "stream_sim_threshold": 1.01,  # exact-only
        }
    }
    (src / "a.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in (
                {"doc_id": 1, "text": "one two three four"},
                {"doc_id": 2, "text": "nope"},  # gated: < 3 tokens
            )
        )
    )
    build_corpus_cmd(spark, cfg)
    first = {
        r["doc_id"] for r in spark.read.parquet(str(out)).collect()
    }
    assert first == {1}
    (src / "b.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in (
                {"doc_id": 3, "text": "one two three four"},   # dup of 1
                {"doc_id": 4, "text": "five six seven eight"},
            )
        )
    )
    build_corpus_cmd(spark, cfg)
    both = {
        r["doc_id"] for r in spark.read.parquet(str(out)).collect()
    }
    assert both == {1, 4}  # 3 dropped against invocation-1 state
    with _pytest.raises(ValueError, match="input_format"):
        build_corpus_cmd(
            spark,
            {"corpus": {"stream": True, "input": "x",
                        "input_format": "wet", "state_dir": "s",
                        "checkpoint_dir": "c", "output": "o"}},
        )
    # batch-only stages are rejected LOUDLY in streaming mode (the
    # old hand-maintained kwargs list silently skipped unknown gates);
    # span/line dedup keys are NOT batch-only any more (round 14 wires
    # the incremental dedupers + post-drain compaction)
    bad = dict(cfg["corpus"], token_budgets={"a": 10})
    with _pytest.raises(ValueError, match="token_budgets"):
        build_corpus_cmd(spark, {"corpus": bad})
    # ...but a config SHARED with the batch build may carry the dedup
    # keys the streaming deduper supersedes (ADVICE r13): exact/fuzzy
    # knobs don't fail startup, and fuzzy_threshold is honored as the
    # deduper's similarity threshold when stream_sim_threshold is absent
    shared = dict(cfg["corpus"], exact_dedup=True, fuzzy_n=3,
                  output=str(tmp_path / "out_shared"),
                  state_dir=str(tmp_path / "state_shared"),
                  checkpoint_dir=str(tmp_path / "ckpt_shared"))
    del shared["stream_sim_threshold"]
    shared["fuzzy_threshold"] = 1.01  # exact-only, via the batch key
    build_corpus_cmd(spark, {"corpus": shared})
    assert {
        r["doc_id"]
        for r in spark.read.parquet(shared["output"]).collect()
    } == {1, 4}  # 3 deduped against 1: the batch threshold was wired


def test_cli_vacuum_index_both_layouts(spark, tmp_path, capsys):
    """--vacuum-index auto-detects the store layout (codes/ dir = PQ)
    and folds the tombstones for both index kinds."""
    from southpaw_spark.operators.ann_index import (
        build_ann_index,
        build_pq_index,
        remove_from_index,
    )

    def vec(i, dim=8):
        return [((i * 29 + j * 13) % 89 - 44) / 44.0 for j in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    dead = corpus.where(F.col("vec_id") % 4 == 0).select("vec_id")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"state.dir: {tmp_path / 'unused'}\n")

    lsh = str(tmp_path / "lsh")
    build_ann_index(corpus, lsh, "embedding", "vec_id", n_planes=4)
    remove_from_index(dead, lsh, "vec_id")
    assert cli.main(["--config", str(cfg), "--vacuum-index", lsh]) == 0
    assert "10 tombstones folded" in capsys.readouterr().out

    pq = str(tmp_path / "pq")
    build_pq_index(corpus, pq, "embedding", "vec_id",
                   m_subspaces=4, n_codes=8)
    remove_from_index(dead, pq, "vec_id")
    assert cli.main(["--config", str(cfg), "--vacuum-index", pq]) == 0
    assert "10 tombstones folded" in capsys.readouterr().out
    import os

    assert not os.path.isdir(os.path.join(lsh, "_deleted"))
    assert not os.path.isdir(os.path.join(pq, "_deleted"))


def test_cli_corpus_stream_kafka_input(spark, tmp_path):
    """corpus.input_format: kafka — two cron-shaped invocations consume
    a documents topic via kafka_py; the checkpoint resumes offsets and
    the persistent dedup state drops a cross-invocation duplicate."""
    import json as _json

    from southpaw_spark.cli import build_corpus_cmd
    from southpaw_spark.sources.kafka_broker import EmbeddedKafkaBroker

    out = tmp_path / "out"
    with EmbeddedKafkaBroker() as broker:
        broker.create_topic("docs", partitions=1)
        cfg = {
            "corpus": {
                "stream": True,
                "input_format": "kafka",
                "kafka": {
                    "bootstrap": broker.bootstrap,
                    "topic": "docs",
                    "value_schema": "doc_id long, text string",
                },
                "state_dir": str(tmp_path / "state"),
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "output": str(out),
                "min_tokens": 3,
                "state_buckets": 4,
                "stream_sim_threshold": 1.01,  # exact-only
            }
        }

        def produce(did, text):
            broker.append(
                "docs", 0, str(did).encode(),
                _json.dumps({"doc_id": did, "text": text}).encode(),
                1_700_000_000_000 + did,
            )

        produce(1, "one two three four")
        produce(2, "nope")  # gated: < 3 tokens
        build_corpus_cmd(spark, cfg)
        first = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
        assert first == {1}

        produce(3, "one two three four")   # dup of 1, later invocation
        produce(4, "five six seven eight")
        build_corpus_cmd(spark, cfg)
        both = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
        assert both == {1, 4}


def test_cli_corpus_stream_forwards_gopher_rep(spark, tmp_path):
    """corpus.stream: true must forward gopher_rep/gopher_rep_thresholds
    to corpus_stream — a repetition-heavy doc is gated in STREAMING mode
    exactly as in batch (regression: the streaming CLI path silently
    dropped the t31 gate)."""
    import json as _json

    from southpaw_spark.cli import build_corpus_cmd

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    cfg = {
        "corpus": {
            "stream": True,
            "input": str(src),
            "input_format": "json",
            "state_dir": str(tmp_path / "state"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "output": str(out),
            "state_buckets": 4,
            "stream_sim_threshold": 1.01,
            "gopher_rep": True,
            "gopher_rep_thresholds": {"top_2gram_char_frac": 0.5},
        }
    }
    clean = (
        "the quick brown fox jumps over one lazy dog while seven "
        "crafted sentences describe entirely different topics using "
        "fresh vocabulary from botany astronomy music carpentry and "
        "maritime navigation without repeating any phrase twice"
    )
    docs = [
        {"doc_id": 1, "text": clean},
        {"doc_id": 2, "text": ("tick tock " * 40).strip()},  # repetition
    ]
    (src / "a.json").write_text(
        "\n".join(_json.dumps(d) for d in docs)
    )
    build_corpus_cmd(spark, cfg)
    kept = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert kept == {1}


def test_cli_vacuum_index_ivf_layout(spark, tmp_path, capsys):
    """--vacuum-index detects the IVF layout (cells/ dir) too."""
    from southpaw_spark.operators.ann_index import (
        build_ivf_index,
        remove_from_index,
    )

    def vec(i, dim=6):
        return [((i * 29 + j * 13) % 89 - 44) / 44.0 for j in range(dim)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    ivf = str(tmp_path / "ivf")
    build_ivf_index(corpus, ivf, "embedding", "vec_id", n_cells=4)
    remove_from_index(
        corpus.where(F.col("vec_id") % 4 == 0).select("vec_id"), ivf,
        "vec_id",
    )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"state.dir: {tmp_path / 'unused'}\n")
    assert cli.main(["--config", str(cfg), "--vacuum-index", ivf]) == 0
    assert "10 tombstones folded" in capsys.readouterr().out
    import os

    assert not os.path.isdir(os.path.join(ivf, "_deleted"))


def test_cli_corpus_stream_span_dedup_compacts(spark, tmp_path):
    """Round 14: span/line dedup keys are honored in streaming mode —
    the CLI builds the incremental dedupers, accumulates evidence over
    the drain, and ships the span-cut corpus to <output>_compacted
    (the batch-dir ledger under <output> stays append-only)."""
    import json as _json

    from southpaw_spark.cli import build_corpus_cmd

    passage = "one two three four five six seven eight"
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            _json.dumps(d)
            for d in (
                {"doc_id": 1, "text": f"alpha beta {passage} gamma delta"},
                {"doc_id": 2, "text": f"omega psi {passage} chi phi"},
                {"doc_id": 3, "text": "plain other words nine ten eleven"},
            )
        )
    )
    cfg = {
        "corpus": {
            "stream": True,
            "input": str(src),
            "input_format": "json",
            "state_dir": str(tmp_path / "state"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "output": str(tmp_path / "out"),
            "state_buckets": 4,
            "stream_sim_threshold": 1.01,
            "span_dedup_k": 8,
            "span_min_count": 2,
        }
    }
    build_corpus_cmd(spark, cfg)
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "out_compacted")).collect()
    }
    assert set(got) == {1, 2, 3}
    assert passage not in got[1] and passage not in got[2]
    assert got[3] == "plain other words nine ten eleven"
    # the raw ledger keeps the UNCUT emissions
    raw = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert passage in raw[1] and passage in raw[2]


def test_cli_corpus_stream_honors_or_rejects_shared_dedup_keys(
    spark, tmp_path
):
    """ADVICE r14: the shared-config exemption must HONOR what it
    exempts, never silently diverge from the batch build — fuzzy_n
    wires into IncrementalDeduper's shingle size (pinned via the
    persisted geometry sidecar), and exact_dedup: false (which the
    stream cannot honor — it always exact-dedups) fails loudly."""
    import json as _json

    import pytest as _pytest

    from southpaw_spark.cli import build_corpus_cmd

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        _json.dumps({"doc_id": 1, "text": "one two three four five six"})
    )
    base = {
        "stream": True,
        "input": str(src),
        "input_format": "json",
        "state_dir": str(tmp_path / "state"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "output": str(tmp_path / "out"),
        "min_tokens": 3,
        "state_buckets": 4,
        "fuzzy_threshold": 0.7,
        "fuzzy_n": 5,  # non-default: must reach the deduper
    }
    build_corpus_cmd(spark, {"corpus": base})
    meta = _json.loads(
        (tmp_path / "state" / "_DEDUP_META.json").read_text()
    )
    assert meta["n"] == 5  # wired, not the silent default 3

    # a geometry mismatch on reopen still fails loudly (the sidecar
    # guard the wiring rides on)
    with _pytest.raises(ValueError, match="n=5"):
        build_corpus_cmd(spark, {"corpus": dict(base, fuzzy_n=3)})

    # exact_dedup: false cannot be honored streaming → loud, with the
    # batch-path escape hatch named
    bad = dict(base, exact_dedup=False,
               state_dir=str(tmp_path / "state2"),
               checkpoint_dir=str(tmp_path / "ckpt2"),
               output=str(tmp_path / "out2"))
    with _pytest.raises(ValueError, match="exact_dedup"):
        build_corpus_cmd(spark, {"corpus": bad})
    # exact_dedup: true stays exempt (the stream does exact-dedup)
    ok = dict(base, exact_dedup=True)
    build_corpus_cmd(spark, {"corpus": ok})  # no new files → no-op drain

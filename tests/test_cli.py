"""End-to-end CLI: the reference's main.py workflow on this engine."""

from __future__ import annotations

import json
import os

from big_data_spark.main import main
from tests.conftest import REFERENCE_DATA


def test_cli_writes_all_three_outputs(spark, tmp_path):
    logs = os.path.join(REFERENCE_DATA, "test.json")
    main([logs, "--out-dir", str(tmp_path)], spark=spark)
    prefix = os.path.join(str(tmp_path), "test.json")

    part1 = f"{prefix}_part1Output.txt"
    obs1 = f"{prefix}_part1Observations.txt"
    obs2 = f"{prefix}_part2Observations.txt"
    assert os.path.isdir(part1) and os.path.isdir(obs1) and os.path.isdir(obs2)

    # part-1 grouped logs are valid JSON lines with the reference's
    # exact field set.
    rows = []
    for name in os.listdir(part1):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(part1, name)) as fh:
                rows += [json.loads(line) for line in fh if line.strip()]
    assert rows
    assert set(rows[0]) == {"state_from", "state_to", "time", "action", "process_id"}

    # part-2 report is non-empty (the reference ships an empty file
    # due to its discarded-union bug; ours always writes content).
    texts = []
    for name in os.listdir(obs2):
        if name.startswith("part-"):
            with open(os.path.join(obs2, name)) as fh:
                texts.append(fh.read())
    assert any(t.strip() for t in texts)


def test_corpus_cli_writes_and_reports(spark, tmp_path, capsys):
    import json

    from big_data_spark.corpus_cli import main as corpus_main
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "corpus")
    funnel = corpus_main([SF_SMOKE, out], spark=spark)
    assert funnel["0_input"] == 500
    assert funnel["5_mixed"] > 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["funnel"] == funnel and parsed["out_dir"] == out
    back = spark.read.parquet(out)
    assert back.count() == funnel["5_mixed"]


def test_corpus_cli_exports_training_shards(spark, tmp_path, capsys):
    import glob
    import json

    from big_data_spark.corpus_cli import main as corpus_main
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "corpus")
    funnel = corpus_main(
        [SF_SMOKE, out, "--export-shards", "4"], spark=spark
    )
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["shards"]["n_shards"] == 4
    assert parsed["shards"]["n_rows"] == funnel["5_mixed"]
    assert parsed["shards"]["max_skew"] <= 1
    assert len(glob.glob(f"{out}_shards/shard=*")) == 4
    back = spark.read.parquet(f"{out}_shards")
    assert back.count() == funnel["5_mixed"]
    assert back.select("doc_id").distinct().count() == funnel["5_mixed"]

"""Dry-run of docs/ACCURACY_RUNBOOK.md (VERDICT r3 #8).

The runbook's promise: the moment a real checkpoint appears, its
commands produce the FullKV-vs-method delta tables with no further
work.  This test executes the runbook's §1 pipeline shape — fullkv +
pyramidkv at a matched budget through ``run_longbench`` then ``eval``
— against the tiny offline checkpoint and ASSERTS the delta is
computable from results.csv, i.e. the acceptance artifact itself
assembles (real scores need real weights; the plumbing is identical).
"""

import json
import os
import sys

import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

REF_DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    from pyramidkv_tpu.runners.make_tiny_checkpoint import build

    d = tmp_path_factory.mktemp("rb") / "tiny-llama"
    return build(str(d))


def _run_cli(main, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        main()
    finally:
        sys.argv = old


def test_runbook_longbench_delta_table(checkpoint, tmp_path):
    from pyramidkv_tpu.runners import eval as eval_cli
    from pyramidkv_tpu.runners import run_longbench

    save = str(tmp_path / "lb")
    # runbook §1 loop, scaled to the smoke sizes
    for method in ("fullkv", "pyramidkv"):
        _run_cli(run_longbench.main, [
            "--model_path", checkpoint, "--model_name", "tiny-llama",
            "--method", method, "--max_capacity_prompts", "64",
            "--window_size", "8", "--kernel_size", "7",
            "--pooling", "maxpool",
            "--data_dir", f"{REF_DATA}/LongBench",
            "--datasets", "multi_news", "--max_num_examples", "2",
            "--model_max_len", "512", "--dtype", "float32",
            "--save_dir", save,
        ])
    run_dir = os.path.join(save, "tiny-llama_64")
    _run_cli(eval_cli.main, ["--results_dir", run_dir,
                             "--suite", "longbench"])
    metrics = json.load(open(os.path.join(run_dir, "multi_news",
                                          "metrics.json")))
    # the acceptance artifact: FullKV row minus method row (both scored,
    # neither the -1 missing sentinel)
    assert metrics["FullKV"] >= 0 and metrics["PyramidKV"] >= 0
    delta = metrics["FullKV"] - metrics["PyramidKV"]
    assert isinstance(delta, float)
    csv_rows = open(os.path.join(run_dir, "results.csv")).read()
    assert "FullKV" in csv_rows and "PyramidKV" in csv_rows


def test_runbook_commands_stay_valid():
    """Every long-flag in the runbook's command blocks must be a real
    argparse option of the runner it targets — the doc can't rot."""
    import re

    from pyramidkv_tpu.runners import (eval as eval_cli, run_longbench,
                                       run_needle, run_ruler)

    text = open(os.path.join(os.path.dirname(__file__), "..", "docs",
                             "ACCURACY_RUNBOOK.md")).read()
    blocks = re.findall(r"```bash\n(.*?)```", text, re.S)
    known = {
        "run_longbench": run_longbench, "run_ruler": run_ruler,
        "run_needle": run_needle, "eval": eval_cli,
    }

    def opts_of(mod):
        import argparse

        captured = {}
        real_parse = argparse.ArgumentParser.parse_args

        def fake_parse(self, *a, **k):
            captured["opts"] = {
                s for act in self._actions for s in act.option_strings
            }
            raise SystemExit(0)

        argparse.ArgumentParser.parse_args = fake_parse
        old = sys.argv
        sys.argv = ["prog"]
        try:
            with pytest.raises(SystemExit):
                mod.main()
        finally:
            argparse.ArgumentParser.parse_args = real_parse
            sys.argv = old
        return captured["opts"]

    cache = {}
    checked = 0
    for block in blocks:
        block = block.replace("\\\n", " ")  # join continuation lines
        for cmd in re.findall(
                r"python -m pyramidkv_tpu\.runners\.(\w+)([^\n]*)", block):
            name, args = cmd
            if name not in known:
                continue
            if name not in cache:
                cache[name] = opts_of(known[name])
            for flag in re.findall(r"(--[\w-]+)", args):
                assert flag in cache[name], (name, flag)
                checked += 1
    assert checked >= 10  # the doc actually contains commands

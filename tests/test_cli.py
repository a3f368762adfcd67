"""CLI entry points (X4) — driven as a user would, via subprocesses."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv):
    out = subprocess.run(
        [sys.executable, "-m", "fs_crawler_ray.cli", *argv],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON output:\n{out.stdout}")


@pytest.mark.parametrize("budget", [None, 10])
def test_cli_crawl_chain(tmp_path, budget):
    corpus = str(tmp_path / "corpus")
    crawl_dir = str(tmp_path / "crawl")
    info = _run("gen-corpus", "--out", corpus, "--n", "250", "--seed", "3")
    assert info["n_docs"] == 250
    args = ["--num-cpus", "4", "crawl", "--corpus", corpus, "--out", crawl_dir, "--hops", "2"]
    if budget:
        args += ["--frontier-budget", str(budget)]
    res = _run(*args)
    assert res["hops"] == [0, 1]
    assert res["log"][0]["vertices"] >= 1

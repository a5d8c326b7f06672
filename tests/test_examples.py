"""Smoke-run every examples/ entry point at the smallest SF — the
runnable surfaces a new user copies from must not rot.  Each main()
runs in-process (get_spark() resolves to the shared test session), with
argv pinned to sf0.001 and throwaway output dirs."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
SF = "/root/testdata/sf0.001"


def _run(monkeypatch, tmp_path, name: str, argv: list[str]):
    monkeypatch.syspath_prepend(EXAMPLES_DIR)
    monkeypatch.setattr(sys, "argv", [f"{name}.py", *argv])
    mod = importlib.import_module(name)
    if name in ("archive_pipeline", "index_pipeline"):
        mod.main(str(tmp_path / name))
    else:
        mod.main()


@pytest.mark.parametrize(
    "name,needs_out",
    [
        ("ann_pipeline", False),
        ("corpus_pipeline", True),
        ("dedup_pipeline", True),
        ("monitoring_pipeline", False),
        ("heuristics_runner", False),
        ("archive_pipeline", False),
        ("index_pipeline", False),
    ],
)
def test_example_runs(spark, monkeypatch, tmp_path, name, needs_out):
    argv = [] if name in ("archive_pipeline", "index_pipeline",
                          "heuristics_runner") else [SF]
    if needs_out:
        argv.append(str(tmp_path / "out"))
    if name == "heuristics_runner":
        # its SessionHeuristic class must pickle by VALUE (script-main
        # semantics): cloudpickle serializes an imported module's class
        # by reference, which Python workers can't resolve — so run it
        # the way a user does
        import subprocess

        res = subprocess.run(
            [sys.executable, os.path.join(EXAMPLES_DIR, f"{name}.py")],
            capture_output=True, text=True, timeout=600,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return
    _run(monkeypatch, tmp_path, name, argv)

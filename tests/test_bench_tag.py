"""bench.py detail-file clobber guard (VERDICT r14 #3).

A BENCH_local_r{tag}.json that is pristine committed evidence (byte-equal
to its git-HEAD blob) must NEVER be overwritten — the tag bumps past it
regardless of n_queries. The r14 driver runs recorded the same query
count as the committed pre-opt baseline, slipped through the old
same-count exception, and destroyed the working-tree copy of the
evidence. Dirty or untracked detail files still overwrite in place
(in-round refreshes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _round_tag  # noqa: E402


@pytest.fixture()
def git_repo(tmp_path):
    """Minimal git repo with CORRECTNESS_r14.json + BENCH_r14.json so the
    derived tag is 15."""
    repo = str(tmp_path)
    subprocess.run(["git", "init", "-q", repo], check=True)
    subprocess.run(
        ["git", "-C", repo, "config", "user.email", "t@t"], check=True
    )
    subprocess.run(["git", "-C", repo, "config", "user.name", "t"], check=True)
    for f in ("CORRECTNESS_r14.json", "BENCH_r14.json"):
        with open(os.path.join(repo, f), "w") as fh:
            json.dump({}, fh)
    return repo


def _commit_all(repo: str) -> None:
    subprocess.run(["git", "-C", repo, "add", "-A"], check=True)
    subprocess.run(
        ["git", "-C", repo, "commit", "-qm", "evidence"], check=True
    )


def test_no_existing_file_uses_derived_tag(git_repo):
    assert _round_tag(git_repo) == "15"


def test_pristine_committed_file_bumps_even_with_same_n_queries(git_repo):
    with open(os.path.join(git_repo, "BENCH_local_r15.json"), "w") as fh:
        json.dump({"n_queries": 232}, fh)
    _commit_all(git_repo)
    # old guard compared n_queries and overwrote on a match; any pristine
    # committed file must bump now, so n_queries is irrelevant.
    assert _round_tag(git_repo) == "16"


def test_dirty_tracked_file_overwrites_in_place(git_repo):
    target = os.path.join(git_repo, "BENCH_local_r15.json")
    with open(target, "w") as fh:
        json.dump({"n_queries": 232}, fh)
    _commit_all(git_repo)
    with open(target, "w") as fh:
        json.dump({"n_queries": 232, "refreshed": True}, fh)
    assert _round_tag(git_repo) == "15"


def test_untracked_file_overwrites_in_place(git_repo):
    with open(os.path.join(git_repo, "BENCH_local_r15.json"), "w") as fh:
        json.dump({"n_queries": 232}, fh)
    assert _round_tag(git_repo) == "15"


def test_bumps_past_consecutive_pristine_files(git_repo):
    for tag in ("15", "16"):
        with open(
            os.path.join(git_repo, f"BENCH_local_r{tag}.json"), "w"
        ) as fh:
            json.dump({"n_queries": 232}, fh)
    _commit_all(git_repo)
    assert _round_tag(git_repo) == "17"

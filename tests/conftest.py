"""Shared pytest fixtures: one local SparkSession for the whole test run."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from poc_spark.session import get_spark

    spark = get_spark("poc_spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture()
def tmp_path_repo(tmp_path_factory):
    """Scratch dir kept inside the repo (.tmp is gitignored; nothing may
    be written outside /root/repo)."""
    import pathlib
    import shutil
    import uuid

    base = pathlib.Path(__file__).resolve().parent.parent / ".tmp" / "pytest"
    d = base / uuid.uuid4().hex[:12]
    d.mkdir(parents=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)

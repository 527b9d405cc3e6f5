"""The allocator-tuning env defaults `get_spark` exports for the JVM
gateway and its forked Python workers (guide §4: page-fault/memcg
charge churn from per-buffer mmap/munmap in every Arrow stage)."""

from torchestra_spark.session import _apply_malloc_tuning

_KEYS = ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_", "ARROW_DEFAULT_MEMORY_POOL")


def test_malloc_tuning_sets_defaults(monkeypatch):
    for k in _KEYS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.delenv("SPARK_GRAFT_MALLOC_TUNING", raising=False)
    _apply_malloc_tuning()
    import os

    assert os.environ["MALLOC_MMAP_THRESHOLD_"] == str(1024**3)
    assert os.environ["MALLOC_TRIM_THRESHOLD_"] == str(1024**3)
    assert os.environ["ARROW_DEFAULT_MEMORY_POOL"] == "system"


def test_malloc_tuning_respects_existing_values(monkeypatch):
    monkeypatch.setenv("MALLOC_MMAP_THRESHOLD_", "131072")
    monkeypatch.setenv("ARROW_DEFAULT_MEMORY_POOL", "jemalloc")
    monkeypatch.delenv("MALLOC_TRIM_THRESHOLD_", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_MALLOC_TUNING", raising=False)
    _apply_malloc_tuning()
    import os

    assert os.environ["MALLOC_MMAP_THRESHOLD_"] == "131072"
    assert os.environ["ARROW_DEFAULT_MEMORY_POOL"] == "jemalloc"
    # unset keys still get the default
    assert os.environ["MALLOC_TRIM_THRESHOLD_"] == str(1024**3)


def test_malloc_tuning_disabled_by_env(monkeypatch):
    for k in _KEYS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("SPARK_GRAFT_MALLOC_TUNING", "0")
    _apply_malloc_tuning()
    import os

    for k in _KEYS:
        assert k not in os.environ

"""Property-based tests (hypothesis) for the versioned-table manifest
layer — the model-based layer on top of the round-9 three-writer
stress: ANY sequence of append / overwrite / rollback / vacuum /
watermark-raise operations must leave the table equivalent to a trivial
in-memory model.  Pure filesystem (synthetic file names, no Spark), so
hundreds of operation sequences run in seconds.
"""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st

from pulsar_ingestion_spark.operators.versioned import VersionedTable


def _touch(table: VersionedTable, name: str) -> str:
    sub = os.path.join(table.data_dir, name)
    os.makedirs(sub, exist_ok=True)
    rel = os.path.join("data", name, "part-0.parquet")
    path = os.path.join(table.root, rel)
    if not os.path.exists(path):
        with open(path, "w") as fh:
            fh.write("x")
    return rel


# an op is ("append"|"overwrite", file_tag) or ("rollback", rel_version)
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 9)),
        st.tuples(st.just("overwrite"), st.integers(0, 9)),
        st.tuples(st.just("rollback"), st.integers(0, 9)),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=80, deadline=None)
@given(ops=OPS)
def test_manifest_history_matches_model(tmp_path_factory, ops):
    """Append-only history: after any op sequence, every version's file
    list equals the in-memory model's, versions are contiguous, and the
    parent chain is intact (rollback included — it WRITES a new version
    pointing at the old list, never mutates history)."""
    t = VersionedTable(str(tmp_path_factory.mktemp("vt")))
    model: list[list[str]] = []  # model[v] = file list of version v
    fresh = 0
    for op, arg in ops:
        if op == "append":
            rel = _touch(t, f"f{fresh}-{arg}")
            fresh += 1
            t._commit_with_retries("append", lambda base, r=rel: base + [r])
            model.append(sorted((model[-1] if model else []) + [rel]))
        elif op == "overwrite":
            rel = _touch(t, f"f{fresh}-{arg}")
            fresh += 1
            t._commit_with_retries("overwrite", lambda _b, r=rel: [r])
            model.append([rel])
        else:  # rollback to an existing version (skip if none yet)
            if not model:
                continue
            target = arg % len(model)
            t.rollback(target)
            model.append(list(model[target]))
    vs = t.versions()
    assert vs == list(range(len(model)))
    for v in vs:
        d = t.describe(v)
        assert sorted(d.files) == model[v], v
        assert d.parent == (v - 1 if v > 0 else None)
    if model:  # a rollback-only sequence commits nothing
        assert sorted(t.describe().files) == model[-1]


@settings(max_examples=80, deadline=None)
@given(
    raises=st.lists(
        st.tuples(st.sampled_from(["appA", "appB", "appC"]),
                  st.integers(0, 50)),
        min_size=1, max_size=25,
    )
)
def test_watermark_is_per_app_running_max(tmp_path_factory, raises):
    """Any interleaving of watermark raises: the effective map is the
    per-app running max, never regressed by a smaller late raise."""
    t = VersionedTable(str(tmp_path_factory.mktemp("vt")))
    expect: dict[str, int] = {}
    for app, bid in raises:
        t._raise_batch_watermark(bid, app)
        expect[app] = max(expect.get(app, -1), bid)
        assert t.batch_watermarks() == expect


@settings(max_examples=40, deadline=None)
@given(
    n_commits=st.integers(3, 10),
    keep_last=st.integers(1, 4),
)
def test_vacuum_keeps_retained_files_readable(tmp_path_factory, n_commits,
                                              keep_last):
    """After vacuum(keep_last=k, grace=0): exactly the last k manifests
    remain, every file they reference still exists, and the batch
    watermark survives the dropped manifests (raised before expiry)."""
    t = VersionedTable(str(tmp_path_factory.mktemp("vt")))
    for i in range(n_commits):
        rel = _touch(t, f"c{i}")
        t._commit_with_retries(
            "stream-append", lambda base, r=rel: base + [r],
            meta={"batch_id": i, "app_id": "app"},
        )
    t.vacuum(keep_last=keep_last, grace_seconds=0.0)
    vs = t.versions()
    assert vs == list(range(max(0, n_commits - keep_last), n_commits))
    for v in vs:
        for rel in t.describe(v).files:
            assert os.path.exists(os.path.join(t.root, rel)), (v, rel)
    # the watermark covers every committed batch, including vacuumed ones
    assert t.batch_watermark("app") == n_commits - 1
    # and a replay of any vacuumed batch id still reads as committed
    assert t._batch_already_committed(0, "app")

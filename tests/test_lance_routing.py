"""Lance routing logic, exercised via a stub module.

The ``lance`` package is absent from this container (BASELINE north rule
names Lance as the table format), so the import-gated branches in
``sources/clips_io.py`` had never executed. These tests inject a minimal
stub to drive the fragment-id round-trip — list_fragments emits
``path#fragment-N`` pseudo-paths, read_fragments parses them back and
hands exactly the selected fragment objects to ``ray.data.read_lance`` —
without needing the real library or a Ray session.
"""

from types import SimpleNamespace

import pytest

import ray.data

from deduplidog_ray.sources import clips_io


class _FakeFragment(SimpleNamespace):
    pass


class _FakeLanceDataset:
    def __init__(self, n):
        self._frags = [_FakeFragment(fragment_id=i) for i in range(n)]

    def get_fragments(self):
        return list(self._frags)


@pytest.fixture
def fake_lance(monkeypatch):
    stub = SimpleNamespace(dataset=lambda path: _FakeLanceDataset(4))
    monkeypatch.setattr(clips_io, "HAVE_LANCE", True)
    monkeypatch.setattr(clips_io, "lance", stub, raising=False)
    calls = {}

    def _read_lance(base, columns=None, fragments=None):
        calls["base"] = base
        calls["columns"] = columns
        calls["fragments"] = fragments
        return "SENTINEL"

    monkeypatch.setattr(ray.data, "read_lance", _read_lance)
    return calls


def test_list_fragments_emits_fragment_ids(fake_lance):
    frags = clips_io.list_fragments("/data/clips.lance")
    assert frags == [f"/data/clips.lance#fragment-{i}" for i in range(4)]


def test_read_fragments_selects_by_id(fake_lance):
    frags = [
        "/data/clips.lance#fragment-1",
        "/data/clips.lance#fragment-3",
    ]
    out = clips_io.read_fragments(frags, columns=["clip_id"])
    assert out == "SENTINEL"
    assert fake_lance["base"] == "/data/clips.lance"
    assert fake_lance["columns"] == ["clip_id"]
    assert [f.fragment_id for f in fake_lance["fragments"]] == [1, 3]


def test_read_clips_routes_lance(fake_lance):
    assert clips_io.read_clips("/data/clips.lance") == "SENTINEL"
    assert fake_lance["fragments"] is None


def test_fragments_hash_stable_for_pseudo_paths(tmp_path):
    """Lance pseudo-paths have no stat(); the lineage hash falls back to
    path identity and stays deterministic."""
    from deduplidog_ray.state.checkpoint import CheckpointManager

    ck = CheckpointManager(str(tmp_path), "cfg0")
    frags = ["/data/clips.lance#fragment-0", "/data/clips.lance#fragment-1"]
    h1 = ck.fragments_hash(frags)
    assert h1 == ck.fragments_hash(list(reversed(frags)))
    assert h1 != ck.fragments_hash(frags[:1])

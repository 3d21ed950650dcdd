"""Native (C++) replay record store: build, round-trip, replay integration."""

import numpy as np
import pytest

from manigaussian_tpu.data.native_store import (NativeRecordStore,
                                                decode_transition,
                                                encode_transition,
                                                load_library)

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="C++ toolchain unavailable")


def _sample_transition():
    return {
        "low_dim_state": np.arange(4, dtype=np.float32),
        "trans_action_indicies": np.array([1, 2, 3], np.int32),
        "lang_token_embs": np.random.RandomState(0).randn(7, 5).astype(np.float32),
        "task": "open_drawer",
        "lang_goal": "open the drawer",
        "terminal": np.bool_(True),
        "reward": np.float32(100.0),
        "nerf_multi_view_rgb": np.array(["/a/0.png", "/a/1.png"], dtype=object),
        "nerf_next_multi_view_rgb": None,
    }


def test_codec_roundtrip():
    tr = _sample_transition()
    out = decode_transition(memoryview(encode_transition(tr)))
    assert out["task"] == "open_drawer"
    assert out["lang_goal"] == "open the drawer"
    assert out["nerf_next_multi_view_rgb"] is None
    np.testing.assert_array_equal(out["low_dim_state"], tr["low_dim_state"])
    np.testing.assert_array_equal(out["lang_token_embs"], tr["lang_token_embs"])
    assert bool(out["terminal"]) is True
    assert float(out["reward"]) == 100.0
    assert list(out["nerf_multi_view_rgb"]) == ["/a/0.png", "/a/1.png"]


def test_store_append_and_mmap_read(tmp_path):
    store = NativeRecordStore(str(tmp_path / "records"))
    recs = [b"hello", b"", b"world" * 1000]
    for r in recs:
        store.append(r)
    store.flush()
    assert len(store) == 3
    for i, r in enumerate(recs):
        assert bytes(store.get(i)) == r
    store.close()

    # fresh reader sees the same data (resume)
    store2 = NativeRecordStore(str(tmp_path / "records"))
    assert len(store2) == 3
    assert bytes(store2.get(2)) == recs[2]
    # append after reopen continues the log
    store2.append(b"more")
    store2.flush()
    assert len(store2) == 4
    assert bytes(store2.get(3)) == b"more"
    store2.close()


def test_replay_native_storage_roundtrip(tmp_path):
    from manigaussian_tpu.data.replay import TaskUniformReplay

    replay = TaskUniformReplay(save_dir=str(tmp_path / "rp"), storage="native")
    assert replay.storage == "native"
    for i in range(5):
        tr = _sample_transition()
        tr["low_dim_state"] = np.full(4, i, np.float32)
        replay.add("open_drawer", tr)
    replay.flush()
    assert replay.size() == 5
    got = replay._get("open_drawer", 3)
    np.testing.assert_array_equal(got["low_dim_state"], np.full(4, 3, np.float32))

    # reload from disk in a new instance
    replay2 = TaskUniformReplay(save_dir=str(tmp_path / "rp"), storage="native")
    replay2.reload_from_disk()
    assert replay2.size() == 5
    rng = np.random.default_rng(0)
    samples = replay2.sample(3, rng)
    assert all(s["task"] == "open_drawer" for s in samples)

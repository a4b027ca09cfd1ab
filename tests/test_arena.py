"""Device sequence arena semantics (ops/banded._Arena).

The round-5 review found the failure modes these tests pin down:
bump-allocation must hand out non-overlapping regions whose contents
read back exactly; a reset (arena full) must bump the epoch so offset
holders re-upload; a store too large for an empty arena must raise
(callers fall back to host-window dispatch).
"""

import numpy as np
import pytest

import dentist_tpu.ops.banded as B


@pytest.fixture
def small_arena(monkeypatch):
    # ~3 write chunks above the mandatory pads: forces resets quickly
    cap = 2 * B.RESIDENT_PAD + 3 * B._ARENA_CHUNK
    monkeypatch.setattr(B, "_arena_capacity", lambda: cap)
    return B._Arena()


def _fetch(arena, off, n):
    return np.asarray(arena.array[off : off + n])


def test_uploads_read_back_and_do_not_overlap(small_arena):
    a = small_arena
    rng = np.random.default_rng(0)
    s1 = rng.integers(0, 4, 1000).astype(np.uint8)
    s2 = rng.integers(0, 4, 2000).astype(np.uint8)
    o1 = a.offset_of(s1)
    o2 = a.offset_of(s2)
    assert o1 >= B.RESIDENT_PAD
    assert o2 >= o1 + len(s1)
    assert np.array_equal(_fetch(a, o1, len(s1)), s1)
    assert np.array_equal(_fetch(a, o2, len(s2)), s2)
    # cached: same object returns the same offset without re-upload
    assert a.offset_of(s1) == o1


def test_reset_bumps_epoch_and_reuploads(small_arena):
    a = small_arena
    rng = np.random.default_rng(1)
    s1 = rng.integers(0, 4, B._ARENA_CHUNK).astype(np.uint8)
    e0 = a.epoch
    a.offset_of(s1)
    # fill until a reset must happen
    stores = []
    for i in range(4):
        s = rng.integers(0, 4, B._ARENA_CHUNK).astype(np.uint8)
        stores.append(s)
        a.offset_of(s, cache=False)
    assert a.epoch > e0, "filling past capacity must reset"
    # the cached store was evicted by the reset; re-request re-uploads
    # at a fresh offset with intact content
    o1b = a.offset_of(s1)
    assert np.array_equal(_fetch(a, o1b, len(s1)), s1)


def test_oversized_store_raises(small_arena):
    a = small_arena
    big = np.zeros(4 * B._ARENA_CHUNK, np.uint8)
    with pytest.raises(MemoryError):
        a.offset_of(big)

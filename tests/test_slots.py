# SPDX-License-Identifier: Apache-2.0
"""Device-resident slot table tests (SURVEY §2.9 HBM session state)."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamkit_tpu.engine.batcher import DeviceBatcher
from streamkit_tpu.engine.slots import SlotTable


def _counter_row():
    return {"count": jnp.zeros((), jnp.float32), "hist": jnp.zeros((4,), jnp.float32)}


def test_alloc_free_reset():
    t = SlotTable(_counter_row, max_slots=4)
    slots = [t.alloc() for _ in range(4)]
    assert sorted(slots) == [0, 1, 2, 3]
    assert t.in_use == 4
    with pytest.raises(RuntimeError, match="exhausted"):
        t.alloc()
    t.free(slots[0])
    assert t.in_use == 3
    again = t.alloc()
    assert again == slots[0]


def test_batched_step_updates_only_submitting_rows():
    t = SlotTable(_counter_row, max_slots=8)
    a, b, c = t.alloc(), t.alloc(), t.alloc()

    def fn(rows, increments):
        new_rows = {
            "count": rows["count"] + increments,
            "hist": rows["hist"] + increments[:, None],
        }
        return new_rows, rows["count"] + increments  # output: new counts

    step = t.make_step(fn)
    out = step(np.asarray([a, c]), jnp.asarray([1.0, 10.0]))
    np.testing.assert_array_equal(np.asarray(out), [1.0, 10.0])
    out = step(np.asarray([a, b]), jnp.asarray([1.0, 5.0]))
    np.testing.assert_array_equal(np.asarray(out), [2.0, 5.0])  # a accumulated, b fresh
    out = step(np.asarray([c]), jnp.asarray([1.0]))
    np.testing.assert_array_equal(np.asarray(out), [11.0])
    # freeing resets the row
    t.free(c)
    c2 = t.alloc()
    assert c2 == c
    out = step(np.asarray([c2]), jnp.asarray([2.0]))
    np.testing.assert_array_equal(np.asarray(out), [2.0])


def test_slot_table_through_batcher():
    """Sessions submit (slot, input) through the batcher; state stays put."""

    async def main():
        t = SlotTable(_counter_row, max_slots=8)

        def fn(rows, xs):
            return {"count": rows["count"] + xs, "hist": rows["hist"]}, rows["count"] + xs

        step = t.make_step(fn)
        b = DeviceBatcher(tick_ms=5.0)
        b.register("counter", lambda slot_ids, xs: step(slot_ids, xs))
        b.start()
        slots = [t.alloc() for _ in range(4)]

        async def session(slot, n):
            total = 0.0
            for i in range(n):
                total = await b.submit("counter", np.int32(slot), np.float32(1.0))
            return float(total)

        results = await asyncio.gather(*(session(s, 5) for s in slots))
        b.stop()
        return results, b.stats()

    results, stats = asyncio.run(main())
    assert results == [5.0, 5.0, 5.0, 5.0]
    assert stats["device_calls"] < stats["submissions"]  # batching happened

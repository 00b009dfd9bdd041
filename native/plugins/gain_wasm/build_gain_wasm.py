# SPDX-License-Identifier: Apache-2.0
"""Assemble the example WASM gain plugin (counterpart of the reference's
``examples/plugins/gain-*`` wasm examples) using the in-env SDK
(``streamkit_tpu.plugins.wasm_asm`` — no wasm compiler in this image).

ABI: sk_alloc / sk_process / sk_set_f32 (see ``streamkit_tpu/plugins/wasm.py``).
The plugin multiplies little-endian f32 samples by a tunable gain.

Usage: python native/plugins/gain_wasm/build_gain_wasm.py [out.wasm]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from streamkit_tpu.plugins.wasm_asm import (  # noqa: E402
    BLOCK,
    BR,
    BR_IF,
    END,
    F32,
    F32_LOAD,
    F32_MUL,
    F32_STORE,
    GLOBAL_GET,
    GLOBAL_SET,
    I32,
    I64,
    I32_ADD,
    I32_AND,
    I32_CONST,
    I32_EQZ,
    I32_GE_U,
    I32_SHL,
    I32_SHR_U,
    I32_SUB,
    I32_GT_S,
    I64_EXTEND_I32_U,
    I64_OR,
    I64_SHL,
    I64_CONST,
    IF,
    LOCAL_GET,
    LOCAL_SET,
    LOCAL_TEE,
    LOOP,
    MEMORY_GROW,
    MEMORY_SIZE,
    DROP,
    VOID,
    WasmModuleBuilder,
    f32c,
    leb,
    memarg,
    sleb,
)


def build() -> bytes:
    b = WasmModuleBuilder()
    heap = b.add_global(I32, True, bytes([I32_CONST]) + sleb(1024) + bytes([END]))
    gain = b.add_global(F32, True, f32c(1.0) + bytes([END]))

    # sk_alloc(size: i32) -> i32  (bump allocator + memory.grow on demand)
    body = bytes(
        [
            GLOBAL_GET, heap,
            LOCAL_SET, 1,                       # old = heap
            GLOBAL_GET, heap,
            LOCAL_GET, 0,
            I32_ADD,
            I32_CONST, 15,
            I32_ADD,
            I32_CONST, 0x70,                    # sleb(-16)
            I32_AND,
            GLOBAL_SET, heap,                   # heap = align16(heap + size)
            # need = ((heap + 65535) >> 16) - memory.size
            GLOBAL_GET, heap,
        ]
    ) + bytes([I32_CONST]) + sleb(65535) + bytes(
        [
            I32_ADD,
            I32_CONST, 16,
            I32_SHR_U,
            MEMORY_SIZE, 0,
            I32_SUB,
            LOCAL_TEE, 2,
            I32_CONST, 0,
            I32_GT_S,
            IF, VOID,
            LOCAL_GET, 2,
            MEMORY_GROW, 0,
            DROP,
            END,
            LOCAL_GET, 1,
            END,
        ]
    )
    alloc = b.add_func([I32], [I32], body, locals_=[I32, I32])

    # sk_set_f32(idx: i32, value: f32)
    body = bytes(
        [
            LOCAL_GET, 0,
            I32_EQZ,
            IF, VOID,
            LOCAL_GET, 1,
            GLOBAL_SET, gain,
            END,
            END,
        ]
    )
    set_f32 = b.add_func([I32, F32], [], body)

    # sk_process(ptr: i32, len: i32) -> i64 packed (ptr<<32 | len)
    body = bytes(
        [
            # n = len >> 2
            LOCAL_GET, 1,
            I32_CONST, 2,
            I32_SHR_U,
            LOCAL_SET, 3,
            BLOCK, VOID,
            LOOP, VOID,
            LOCAL_GET, 2,
            LOCAL_GET, 3,
            I32_GE_U,
            BR_IF, 1,
            # addr = ptr + (i << 2)
            LOCAL_GET, 0,
            LOCAL_GET, 2,
            I32_CONST, 2,
            I32_SHL,
            I32_ADD,
            LOCAL_TEE, 4,
            # value = f32.load(addr) * gain
            LOCAL_GET, 4,
            F32_LOAD,
        ]
    ) + memarg(2, 0) + bytes(
        [
            GLOBAL_GET, gain,
            F32_MUL,
            F32_STORE,
        ]
    ) + memarg(2, 0) + bytes(
        [
            # i += 1
            LOCAL_GET, 2,
            I32_CONST, 1,
            I32_ADD,
            LOCAL_SET, 2,
            BR, 0,
            END,
            END,
            # return (i64(ptr) << 32) | i64(len)
            LOCAL_GET, 0,
            I64_EXTEND_I32_U,
            I64_CONST, 32,
            I64_SHL,
            LOCAL_GET, 1,
            I64_EXTEND_I32_U,
            I64_OR,
            END,
        ]
    )
    process = b.add_func([I32, I32], [I64], body, locals_=[I32, I32, I32])

    b.export_memory()
    b.export_func("sk_alloc", alloc)
    b.export_func("sk_set_f32", set_f32)
    b.export_func("sk_process", process)
    return b.build()


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "build", "gain.wasm"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    data = build()
    open(out, "wb").write(data)
    print(f"wrote {os.path.normpath(out)} ({len(data)} bytes)")

"""GGUF format demo: write a file with every metadata value type and a
few tensors, read it back, and verify bit-exactness
(reference: examples/gguf/gguf.cpp — the same write → read → compare
round trip over the C API).

    python examples/gguf.py [out.gguf]
"""
# run standalone from a repo checkout without installing the package
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np

from llama_cpp_gfx906_tpu.gguf import GGMLType, GGUFReader
from llama_cpp_gfx906_tpu.gguf.constants import GGUFValueType
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gguf-demo.gguf"

# -- write -------------------------------------------------------------------
w = GGUFWriter(path, "demo")
w.add_string("general.name", "gguf-demo")
w.add_uint32("demo.some_u32", 0xDEADBEEF)
w.add_float32("demo.some_f32", 0.25)
w.add_bool("demo.some_bool", True)
w.add_kv("demo.some_i32", -42, GGUFValueType.INT32)
w.add_array("demo.arr_i32", np.asarray([1, 2, 3, 4], np.int32))
w.add_array("demo.arr_f32", np.asarray([1.5, 2.5], np.float32))
w.add_array("demo.arr_str", ["alpha", "beta", "gamma"])

rng = np.random.default_rng(0)
tensors = {}
for i in range(4):
    name = f"tensor_{i}"
    arr = rng.standard_normal((16, 32 * (i + 1))).astype(np.float32)
    tensors[name] = arr
    # alternate F32 / F16 to exercise both plain codecs
    w.add_tensor(name, arr, GGMLType.F32 if i % 2 == 0 else GGMLType.F16)
w.write()
print(f"wrote {path}")

# -- read back & verify ------------------------------------------------------
r = GGUFReader(path)
assert r.architecture == "demo"
assert r.get("demo.some_u32") == 0xDEADBEEF
assert abs(r.get("demo.some_f32") - 0.25) < 1e-9
assert r.get("demo.some_bool") is True
assert r.get("demo.some_i32") == -42
assert list(r.get("demo.arr_i32")) == [1, 2, 3, 4]
assert list(r.get("demo.arr_str")) == ["alpha", "beta", "gamma"]

for i, (name, ref) in enumerate(tensors.items()):
    got = r.tensors[name].to_f32()
    if i % 2 == 0:
        np.testing.assert_array_equal(got, ref)  # F32: bit-exact
    else:
        np.testing.assert_allclose(got, ref.astype(np.float16).astype(np.float32))
    print(f"  {name}: shape={got.shape} ok")

print(f"metadata keys: {len(r.metadata)}, tensors: {len(r.tensors)} — all verified")

"""Interactive GGUF metadata/tensor editor.

Terminal analog of the reference's ``gguf-py/gguf/scripts/
gguf_editor_gui.py`` (a PySide6 GUI, 1,621 LoC): the same capabilities —
browse metadata and tensors, add/edit/remove metadata keys, rename or
drop tensors — as a line-oriented REPL (this deployment has no display
server).  Writing funnels through the same rewrite path as
``gguf_new_metadata``, so tensor bytes are copied verbatim.

    python -m llama_cpp_gfx906_tpu.tools.gguf_editor model.gguf

Commands:
    kv                      list metadata (key, type, preview)
    kv KEY                  print one value in full
    set KEY JSON_VALUE      add/override a key (value parsed as JSON)
    del KEY                 remove a key
    tensors [FILTER]        list tensors (name, shape, type)
    rename OLD NEW          rename a tensor
    drop NAME               remove a tensor
    save [PATH]             write (default: <input>.edited.gguf)
    quit
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..gguf.constants import GGMLType, GGUFValueType
from ..gguf.reader import GGUFModelReader
from ..gguf.writer import GGUFWriter


class EditorState:
    def __init__(self, path: str):
        self.path = path
        self.reader = GGUFModelReader(path)
        r0 = self.reader.readers[0]
        self.arch = r0.architecture
        self.kv = {k: r0.get(k) for k in r0.field_names()}
        # name → (TensorInfo) ; renames/drops tracked as a name map
        self.tensors = dict(self.reader.tensors)

    def save(self, out_path: str) -> str:
        w = GGUFWriter(out_path, self.arch)
        for key, value in self.kv.items():
            if key == "general.architecture":
                continue
            vtype = (GGUFValueType.ARRAY
                     if isinstance(value, (list, np.ndarray)) else None)
            w.add_kv(key, value, vtype)
        for name, t in self.tensors.items():
            w.add_tensor(name, np.asarray(t.data), t.ggml_type, raw_ne=t.ne)
        return w.write()


def _preview(value, width: int = 60) -> str:
    s = str(value)
    return s if len(s) <= width else s[: width - 3] + "..."


def run_command(st: EditorState, line: str) -> str | None:
    """Execute one editor command; returns printable output (None=quit)."""
    parts = line.strip().split(None, 2)
    if not parts:
        return ""
    cmd = parts[0]
    if cmd in ("quit", "exit", "q"):
        return None
    if cmd == "kv":
        if len(parts) > 1:
            key = parts[1]
            if key not in st.kv:
                return f"no such key: {key}"
            return f"{key} = {st.kv[key]!r}"
        rows = [f"{k:<50} {type(v).__name__:<8} {_preview(v)}"
                for k, v in st.kv.items()]
        return "\n".join(rows) or "(no metadata)"
    if cmd == "set":
        if len(parts) < 3:
            return "usage: set KEY JSON_VALUE"
        key, raw = parts[1], parts[2]
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw  # bare string convenience
        st.kv[key] = value
        return f"{key} = {value!r}"
    if cmd == "del":
        if len(parts) < 2 or parts[1] not in st.kv:
            return "usage: del KEY (existing)"
        del st.kv[parts[1]]
        return f"removed {parts[1]}"
    if cmd == "tensors":
        filt = parts[1] if len(parts) > 1 else ""
        rows = [f"{n:<50} {tuple(t.shape)!s:<20} {GGMLType(t.ggml_type).name}"
                for n, t in st.tensors.items() if filt in n]
        return "\n".join(rows) or "(no match)"
    if cmd == "rename":
        if len(parts) < 3:
            return "usage: rename OLD NEW"
        old, new = parts[1], parts[2]
        if old not in st.tensors:
            return f"no such tensor: {old}"
        if new in st.tensors:
            return f"tensor exists: {new}"
        st.tensors = {new if n == old else n: t for n, t in st.tensors.items()}
        return f"renamed {old} -> {new}"
    if cmd == "drop":
        if len(parts) < 2 or parts[1] not in st.tensors:
            return "usage: drop NAME (existing tensor)"
        del st.tensors[parts[1]]
        return f"dropped {parts[1]}"
    if cmd == "save":
        out = parts[1] if len(parts) > 1 else st.path + ".edited.gguf"
        path = st.save(out)
        return f"wrote {path}"
    return f"unknown command: {cmd} (kv/set/del/tensors/rename/drop/save/quit)"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="gguf-editor (TPU)", description="interactive GGUF editor")
    ap.add_argument("model", help="GGUF file to edit")
    args = ap.parse_args(argv)

    st = EditorState(args.model)
    print(f"{args.model}: arch={st.arch}, {len(st.kv)} keys, "
          f"{len(st.tensors)} tensors — 'kv' to list, 'quit' to exit")
    while True:
        try:
            line = input("gguf> ")
        except (EOFError, KeyboardInterrupt):
            break
        out = run_command(st, line)
        if out is None:
            break
        if out:
            print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

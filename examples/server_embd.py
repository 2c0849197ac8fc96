"""Batch-embed texts against a running server and report pairwise cosine
similarities (reference: examples/server_embd.py).

    python -m llama_cpp_gfx906_tpu.server.app -m model.gguf --embeddings &
    python examples/server_embd.py http://127.0.0.1:8080 "a" "b" "c"
"""

import json
import sys
import urllib.request


def embed(base, texts):
    req = urllib.request.Request(
        base.rstrip("/") + "/v1/embeddings",
        data=json.dumps({"input": texts, "model": "default"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        data = json.load(r)["data"]
    return [d["embedding"] for d in sorted(data, key=lambda d: d["index"])]


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:8080"
    texts = sys.argv[2:] or ["Hello world", "Goodbye world", "The weather is nice"]
    vecs = embed(base, texts)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb or 1.0)

    for i, a in enumerate(texts):
        for j in range(i + 1, len(texts)):
            print(f"cos({a!r}, {texts[j]!r}) = {cos(vecs[i], vecs[j]):.4f}")


if __name__ == "__main__":
    main()

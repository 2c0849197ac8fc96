"""``python -m llama_cpp_gfx906_tpu.server`` → the OpenAI-compatible
server CLI (reference: tools/server/server.cpp main)."""

from .app import main

if __name__ == "__main__":
    raise SystemExit(main())

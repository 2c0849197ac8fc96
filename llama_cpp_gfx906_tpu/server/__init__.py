"""OpenAI-compatible continuous-batching HTTP server (llama-server analog)."""

from .app import InferenceServer, build_app, main  # noqa: F401

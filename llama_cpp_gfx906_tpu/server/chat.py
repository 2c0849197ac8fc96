"""Back-compat shim — chat formatting moved to llama_cpp_gfx906_tpu.chat."""

from ..chat import CHATML_FALLBACK, render_chat_template  # noqa: F401

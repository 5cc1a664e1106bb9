"""``python -m vietvoice_tts_tpu`` entry point (reference __main__.py:8-11)."""

from . import deterministic  # noqa: F401 — freeze seeds first
from .cli import main

if __name__ == "__main__":
    main()

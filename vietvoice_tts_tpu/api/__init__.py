"""Async REST API.

Same five routes and schemas as the reference Litestar app
(``/root/reference/vietvoicetts/api/app.py:37-168``), served by a
dependency-free ASGI micro-framework (``asgi.py``) because Litestar is not
part of this image. Any ASGI server (uvicorn/hypercorn) can host ``app``;
``server.py`` also ships a stdlib fallback server.
"""

from .app import app

__all__ = ["app"]

"""Streaming decision-support server.

Speaks the reference's exact HTTP/WebSocket contract
(reference platform/backend/main.py): pages, /health, /api/upload-video,
/ws streaming at an adjustable 1-60 Hz tick, /ws/playground batch replay —
on a dependency-free asyncio runtime (this image ships no fastapi/uvicorn;
the HTTP/1.1 + RFC6455 layer is ~400 lines of stdlib).
"""

from fav_tpu.serving.httpws import HttpServer, Request, Response, WebSocket  # noqa: F401
from fav_tpu.serving.app import create_app  # noqa: F401

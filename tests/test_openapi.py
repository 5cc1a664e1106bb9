"""OpenAPI document route + ASGI body-size guard.

Round-3 verdict #7/#8: the reference's Litestar app auto-serves a
machine-readable API description (``/root/reference/vietvoicetts/api/app.py:
166-168``); the hand-rolled ASGI framework must offer the same contract, and
must reject oversized request bodies (413) before buffering them whole.
"""

import asyncio
import json

import importlib

import jsonschema
import pytest

from vietvoice_tts_tpu.api.asgi import App, AsyncTestClient, JSONResponse

# ``from vietvoice_tts_tpu.api import app`` resolves to the App instance
# (the package __init__ rebinds the attribute); importlib gets the module.
app_module = importlib.import_module("vietvoice_tts_tpu.api.app")


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


@pytest.fixture
def client():
    return AsyncTestClient(app_module.app)


# Structural OpenAPI 3.1 schema (the subset that matters for client
# generators), validated with the Draft 2020-12 validator jsonschema ships.
OPENAPI_31_STRUCTURE = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["openapi", "info", "paths"],
    "properties": {
        "openapi": {"type": "string", "pattern": r"^3\.1\.\d+$"},
        "info": {
            "type": "object",
            "required": ["title", "version"],
            "properties": {
                "title": {"type": "string"},
                "version": {"type": "string"},
            },
        },
        "paths": {
            "type": "object",
            "patternProperties": {
                "^/": {
                    "type": "object",
                    "patternProperties": {
                        "^(get|post|put|delete|patch)$": {
                            "type": "object",
                            "required": ["responses"],
                            "properties": {
                                "responses": {"type": "object", "minProperties": 1}
                            },
                        }
                    },
                }
            },
        },
        "components": {
            "type": "object",
            "properties": {"schemas": {"type": "object"}},
        },
    },
}


class TestOpenAPIDocument:
    def test_document_is_valid_openapi_31(self, client):
        resp = run(client.get("/schema/openapi.json"))
        assert resp.status_code == 200
        doc = resp.json()
        jsonschema.Draft202012Validator.check_schema(OPENAPI_31_STRUCTURE)
        jsonschema.validate(doc, OPENAPI_31_STRUCTURE)

    def test_reference_routes_are_documented(self, client):
        doc = run(client.get("/schema/openapi.json")).json()
        paths = doc["paths"]
        # The five reference routes (api/app.py:37-162) all present.
        assert "get" in paths["/api/v1/health"]
        assert "post" in paths["/api/v1/synthesize"]
        assert "post" in paths["/api/v1/synthesize/file"]
        assert "get" in paths["/api/v1/download/{file_id}"]
        assert "post" in paths["/api/v1/synthesize/download"]

    def test_request_and_response_models_are_referenced(self, client):
        doc = run(client.get("/schema/openapi.json")).json()
        schemas = doc["components"]["schemas"]
        assert "SynthesizeRequest" in schemas
        assert "HealthResponse" in schemas
        body = doc["paths"]["/api/v1/synthesize"]["post"]["requestBody"]
        ref = body["content"]["application/json"]["schema"]["$ref"]
        assert ref == "#/components/schemas/SynthesizeRequest"
        # Every $ref in the document resolves within components.schemas.
        def refs(node):
            if isinstance(node, dict):
                for k, v in node.items():
                    if k == "$ref":
                        yield v
                    else:
                        yield from refs(v)
            elif isinstance(node, list):
                for v in node:
                    yield from refs(v)

        for r in refs(doc):
            assert r.startswith("#/components/schemas/")
            assert r.split("/")[-1] in schemas, r

    def test_path_parameters_are_declared(self, client):
        doc = run(client.get("/schema/openapi.json")).json()
        op = doc["paths"]["/api/v1/download/{file_id}"]["get"]
        assert op["parameters"][0] == {
            "name": "file_id",
            "in": "path",
            "required": True,
            "schema": {"type": "string"},
        }

    def test_schema_landing_page(self, client):
        resp = run(client.get("/schema"))
        assert resp.status_code == 200
        assert "openapi.json" in resp.text


class TestBodySizeGuard:
    def _big_body_scope_driver(self, app, chunks, content_length=None):
        """Drive the raw ASGI interface with a chunked oversized body."""
        sent = {"status": None, "body": b""}
        messages = [
            {"type": "http.request", "body": c, "more_body": i < len(chunks) - 1}
            for i, c in enumerate(chunks)
        ]

        async def receive():
            return messages.pop(0) if messages else {"type": "http.disconnect"}

        async def send(message):
            if message["type"] == "http.response.start":
                sent["status"] = message["status"]
            elif message["type"] == "http.response.body":
                sent["body"] += message.get("body", b"")

        headers = []
        if content_length is not None:
            headers.append((b"content-length", str(content_length).encode()))
        scope = {
            "type": "http",
            "method": "POST",
            "path": "/echo",
            "headers": headers,
        }
        run(app(scope, receive, send))
        return sent

    def _make_app(self, cap):
        app = App(max_body_bytes=cap)

        @app.post("/echo")
        async def echo() -> JSONResponse:
            return JSONResponse({"ok": True})

        return app

    def test_declared_content_length_over_cap_is_413_without_reading(self):
        app = self._make_app(cap=1024)
        sent = self._big_body_scope_driver(
            app, chunks=[b""], content_length=10 * 1024 * 1024
        )
        assert sent["status"] == 413
        assert b"exceeds" in sent["body"]

    def test_chunked_body_over_cap_is_413_mid_stream(self):
        """No Content-Length (chunked): the guard must trip while draining,
        not after buffering the whole body."""
        app = self._make_app(cap=1024)
        # 8 chunks × 512 B = 4 KiB total; guard must trip at chunk 3.
        sent = self._big_body_scope_driver(app, chunks=[b"x" * 512] * 8)
        assert sent["status"] == 413

    def test_body_under_cap_passes(self):
        app = self._make_app(cap=1024)
        sent = self._big_body_scope_driver(app, chunks=[b"x" * 100])
        assert sent["status"] == 200

    def test_oversized_synthesize_request_is_413(self, client):
        """Through the real app: the production cap rejects a multi-MB
        synthesize POST."""
        resp = run(
            client.post("/api/v1/synthesize", json={"text": "x" * (2 << 20)})
        )
        assert resp.status_code == 413

    def test_guard_does_not_buffer_past_cap(self):
        """Memory check: the app must stop accumulating once over the cap."""
        app = self._make_app(cap=1024)
        seen = {"reads": 0}
        messages = [
            {"type": "http.request", "body": b"x" * 512, "more_body": True}
            for _ in range(100)
        ] + [{"type": "http.request", "body": b"", "more_body": False}]

        async def receive():
            seen["reads"] += 1
            return messages.pop(0)

        sent = {}

        async def send(message):
            if message["type"] == "http.response.start":
                sent["status"] = message["status"]

        run(
            app(
                {"type": "http", "method": "POST", "path": "/echo", "headers": []},
                receive,
                send,
            )
        )
        assert sent["status"] == 413
        assert seen["reads"] <= 4  # tripped at ~2×512B, not after 100 chunks


class TestTypedPathParams:
    def _app(self):
        app = App()

        @app.get("/items/{n:int}")
        async def item(n) -> JSONResponse:
            return JSONResponse({"n": n, "type": type(n).__name__})

        @app.get("/files/{rest:path}")
        async def f(rest) -> JSONResponse:
            return JSONResponse({"rest": rest})

        return app

    def test_int_param_converted_and_validated(self):
        from vietvoice_tts_tpu.api.testing import AsyncTestClient

        client = AsyncTestClient(self._app())
        resp = run(client.get("/items/42"))
        assert resp.json() == {"n": 42, "type": "int"}
        # non-numeric doesn't match the int pattern → 404, not a crash
        assert run(client.get("/items/abc")).status_code == 404

    def test_path_param_crosses_slashes(self):
        from vietvoice_tts_tpu.api.testing import AsyncTestClient

        client = AsyncTestClient(self._app())
        resp = run(client.get("/files/a/b/c.wav"))
        assert resp.json() == {"rest": "a/b/c.wav"}

    def test_unknown_converter_rejected_at_registration(self):
        app = App()
        with pytest.raises(ValueError, match="Unknown path-parameter type"):

            @app.get("/x/{y:zzz}")
            async def h(y):  # pragma: no cover
                return None

    def test_float_param_converts_and_rejects_nonnumeric(self):
        """ADVICE r4: 'e', '+', '1.2.3' matched the old float pattern and
        blew up in float() as a server-level 500; they must 404."""
        from vietvoice_tts_tpu.api.testing import AsyncTestClient

        app = App()

        @app.get("/speed/{x:float}")
        async def speed(x) -> JSONResponse:
            return JSONResponse({"x": x, "type": type(x).__name__})

        client = AsyncTestClient(app)
        assert run(client.get("/speed/1.5")).json() == {"x": 1.5, "type": "float"}
        assert run(client.get("/speed/-2e3")).json()["x"] == -2000.0
        assert run(client.get("/speed/.5")).json()["x"] == 0.5
        for bad in ("e", "+", "-", "1.2.3", "1e", "--1", "nan"):
            resp = run(client.get(f"/speed/{bad}"))
            assert resp.status_code == 404, (bad, resp.status_code)

    def test_openapi_paths_strip_converter_suffixes(self):
        from vietvoice_tts_tpu.api.asgi import openapi_schema

        doc = openapi_schema(self._app())
        assert "/items/{n}" in doc["paths"]
        assert "/items/{n:int}" not in doc["paths"]
        assert "/files/{rest}" in doc["paths"]

#!/usr/bin/env python3
"""Standalone frontend dev server on :3000.

Parity with the reference's Vite dev server (reference
frontend/vite.config.js:1-16, port 3000; docker-compose.yml maps
frontend:3000 → backend:8000). The app is dependency-free ES modules,
so "dev server" is just static file serving; the UI talks to the
backend at http://localhost:8000 (override with ?api=...).

Usage: python frontend/serve.py [--port 3000] [--host 0.0.0.0]
"""

from __future__ import annotations

import argparse
import functools
import http.server
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description="frontend static server")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=3000)
    args = ap.parse_args()

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler,
        directory=str(Path(__file__).parent),
    )
    with http.server.ThreadingHTTPServer((args.host, args.port), handler) as srv:
        print(f"frontend: http://{args.host}:{args.port}/ (backend expected on :8000)")
        srv.serve_forever()


if __name__ == "__main__":
    main()

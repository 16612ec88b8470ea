"""Minimal HTTP endpoint exposing the embeddable prover API.

The analog of the reference's wasm demo server (wasm/server.js — an express
static server for the browser harness).  Ours serves the four embed functions
as JSON POST endpoints with the python stdlib only:

    POST /generateProofs       {circuit, setup, px, inputs}
    POST /verifyProofs         {proof, setup, publicInputs}
    POST /grothGenerateProofs  {circuit, setup, px, inputs}
    POST /grothVerifyProofs    {proof, setup, publicInputs}

Run: ``python -m go_snark_study_tpu.server [port]`` (default 8080).
"""

from __future__ import annotations

import json
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

from . import embed

__all__ = ["make_server", "main"]


class _Handler(BaseHTTPRequestHandler):
    def _reply(self, code: int, payload: dict | str) -> None:
        body = payload if isinstance(payload, str) else json.dumps(payload)
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self) -> None:  # noqa: N802 (stdlib API)
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            j = json.dumps
            if self.path == "/generateProofs":
                out = embed.generate_proofs(
                    j(req["circuit"]), j(req["setup"]), j(req["px"]), j(req["inputs"])
                )
            elif self.path == "/verifyProofs":
                out = embed.verify_proofs(
                    j(req["proof"]), j(req["setup"]), j(req["publicInputs"])
                )
            elif self.path == "/grothGenerateProofs":
                out = embed.groth_generate_proofs(
                    j(req["circuit"]), j(req["setup"]), j(req["px"]), j(req["inputs"])
                )
            elif self.path == "/grothVerifyProofs":
                out = embed.groth_verify_proofs(
                    j(req["proof"]), j(req["setup"]), j(req["publicInputs"])
                )
            else:
                self._reply(404, {"error": f"unknown endpoint {self.path}"})
                return
            self._reply(200, out)
        except Exception as e:  # report, don't crash the server
            self._reply(400, {"error": str(e)})

    def log_message(self, fmt, *args):  # quiet
        pass


def make_server(port: int = 8080) -> HTTPServer:
    return HTTPServer(("127.0.0.1", port), _Handler)


def main(argv=None) -> int:
    port = int((argv or sys.argv[1:] or ["8080"])[0])
    srv = make_server(port)
    print(f"go-snark embed API listening on 127.0.0.1:{port}")
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Minimal HTTP serving host for exported artifacts (std-lib only).

Demonstrates the deployment contract end-to-end: a serving host needs jax,
numpy, PIL and the artifact file — none of the framework's code. POST a PNG
image to /predict and receive the label map as a PNG (mode L); GET /healthz
returns the artifact metadata.

    python scripts/serve_http.py --artifact model_321.jaxexport --port 8321
    curl -s --data-binary @street.png localhost:8321/predict > labels.png

The AOT program has a symbolic batch dimension; this host serves batch=1 per
request (batch across requests by aggregating before .call if needed).
"""

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(call, meta):
    import numpy as np
    from PIL import Image

    hw = tuple(meta["input_hw"]) if meta else None

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps(meta or {}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            img = Image.open(io.BytesIO(self.rfile.read(n))).convert("RGB")
            if hw is not None and img.size != (hw[1], hw[0]):
                # serve at the artifact's static resolution
                img = img.resize((hw[1], hw[0]), Image.BILINEAR)
            x = np.asarray(img, dtype=np.uint8)[None]
            pred = np.asarray(call(x))[0].astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(pred, mode="L").save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--port", type=int, default=8321)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()

    # jax-only load: the serving host does not import the framework
    from jax import export as jexport
    with open(args.artifact, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    meta = None
    try:
        with open(args.artifact + ".json") as f:
            meta = json.load(f)
    except FileNotFoundError:
        pass

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(exported.call, meta))
    print(f"serving {args.artifact} on {args.host}:{args.port}", file=sys.stderr)
    server.serve_forever()


if __name__ == "__main__":
    main()

"""Web demo UI — the TPU-native equivalent of the reference's streamlit demo.

Parity target: scripts/demo/sampling.py + streamlit_helpers.py (studied, not
copied).  The reference wraps do_sample/do_img2img in streamlit widgets:
a model-version selectbox (VERSION2SPECS, sampling.py:36-77), prompt boxes,
and the init_sampling sidebar (sampler / discretization / guider / steps,
streamlit_helpers.py:277-322), keeping the loaded model warm in st.cache
(init_st, :75).  Neither streamlit nor gradio exists in this image, so the
same surface is served with the standard library: an http.server form UI in
front of the exact `sampling_image` session/sampling core the headless CLI
uses.  Models stay warm across requests in a session cache; requests are
handled serially (the chip runs one program at a time anyway).

Run:  python -m ccedit_tpu.cli.demo --config_path configs/... [--port 7860]
      [--version "sd21=configs/sd_2_1.yaml:ckpts/v2-1.safetensors"] ...
"""

from __future__ import annotations

import argparse
import base64
import html
import io
import json
import tempfile
import time
from email.message import Message
from email.parser import BytesParser
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path
from typing import Dict, Optional, Tuple
from urllib.parse import parse_qs

import numpy as np

from .pipeline import SAMPLER_NAMES
from .sampling_image import (
    DISCRETIZATION_NAMES,
    GUIDER_NAMES,
    ImageSession,
    add_image_args,
    build_image_session,
    sample_images,
)

_FORM_FIELDS = (
    ("prompt", "a professional photograph", "text"),
    ("negative_prompt", "", "text"),
    ("seed", "42", "number"),
    ("H", "512", "number"),
    ("W", "512", "number"),
    ("sample_steps", "40", "number"),
    ("cfg_scale", "7.5", "number"),
    ("num_samples", "1", "number"),
    ("img2img_strength", "0.75", "number"),
)


def parse_multipart(body: bytes, content_type: str) -> Tuple[Dict[str, str], Dict[str, bytes]]:
    """Minimal multipart/form-data parser on the stdlib email machinery."""
    head = f"Content-Type: {content_type}\r\nMIME-Version: 1.0\r\n\r\n".encode()
    msg: Message = BytesParser().parsebytes(head + body)
    fields: Dict[str, str] = {}
    files: Dict[str, bytes] = {}
    for part in msg.get_payload():
        name = part.get_param("name", header="content-disposition")
        if name is None:
            continue
        payload = part.get_payload(decode=True) or b""
        if part.get_filename():
            if payload:
                files[name] = payload
        else:
            fields[name] = payload.decode("utf-8", "replace")
    return fields, files


class DemoState:
    """Warm model sessions keyed on (version, H, W) — the init_st cache."""

    def __init__(self, base_args, versions: Dict[str, Dict[str, str]]):
        self.base_args = base_args
        self.versions = versions
        self._sessions: Dict[tuple, ImageSession] = {}

    def request_args(self, fields: Dict[str, str],
                     init_image_path: str = "") -> argparse.Namespace:
        args = argparse.Namespace(**vars(self.base_args))
        spec = self.versions[fields.get("version", next(iter(self.versions)))]
        args.config_path = spec["config"]
        if spec.get("ckpt"):
            args.ckpt_path = spec["ckpt"]
        for key, default, _ in _FORM_FIELDS:
            raw = fields.get(key, default)
            cur = getattr(args, key)
            args.__dict__[key] = type(cur)(raw) if not isinstance(cur, str) else raw
        args.sampler_name = fields.get("sampler_name", args.sampler_name)
        args.discretization = fields.get("discretization", args.discretization)
        args.guider = fields.get("guider", args.guider)
        args.init_image = init_image_path
        return args

    def session(self, fields: Dict[str, str], args) -> ImageSession:
        key = (fields.get("version", next(iter(self.versions))), args.H, args.W)
        if key not in self._sessions:
            self._sessions[key] = build_image_session(args)
        return self._sessions[key]


def render_form(state: DemoState, message: str = "",
                images_b64: Optional[list] = None) -> str:
    opt = lambda names, sel=None: "".join(
        f'<option{" selected" if n == sel else ""}>{html.escape(str(n))}</option>'
        for n in names)
    rows = "".join(
        f'<tr><td>{k}</td><td><input name="{k}" value="{v}" type="{t}" '
        f'step="any"></td></tr>'
        for k, v, t in _FORM_FIELDS)
    imgs = "".join(
        f'<img src="data:image/png;base64,{b}" style="max-width:512px;margin:4px">'
        for b in (images_b64 or []))
    return f"""<!doctype html><html><head><title>ccedit-tpu demo</title></head>
<body style="font-family:sans-serif;max-width:720px;margin:2em auto">
<h2>ccedit-tpu sampling demo</h2>
<p>{html.escape(message)}</p>
<form method="post" action="/generate" enctype="multipart/form-data">
<table>
<tr><td>version</td><td><select name="version">{opt(state.versions)}</select></td></tr>
{rows}
<tr><td>sampler</td><td><select name="sampler_name">{opt(sorted(SAMPLER_NAMES), state.base_args.sampler_name)}</select></td></tr>
<tr><td>discretization</td><td><select name="discretization">{opt(DISCRETIZATION_NAMES, state.base_args.discretization)}</select></td></tr>
<tr><td>guider</td><td><select name="guider">{opt(GUIDER_NAMES, state.base_args.guider)}</select></td></tr>
<tr><td>init image (img2img)</td><td><input type="file" name="init_image"></td></tr>
</table>
<button type="submit">Generate</button>
</form>
<div>{imgs}</div>
</body></html>"""


def _png_b64(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def make_handler(state: DemoState):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: str, ctype="text/html; charset=utf-8"):
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *a):  # quiet: one line per request below
            pass

        def do_GET(self):
            if self.path == "/health":
                self._send(200, json.dumps({"status": "ok"}),
                           "application/json")
            else:
                self._send(200, render_form(state))

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, "not found")
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if ctype.startswith("multipart/form-data"):
                fields, files = parse_multipart(body, ctype)
            else:
                fields = {k: v[0] for k, v in parse_qs(body.decode()).items()}
                files = {}
            init_path = ""
            if files.get("init_image"):
                f = tempfile.NamedTemporaryFile(suffix=".png", delete=False)
                f.write(files["init_image"])
                f.close()
                init_path = f.name
            try:
                args = state.request_args(fields, init_path)
                t0 = time.time()
                session = state.session(fields, args)
                save_dir = Path(args.save_path) / time.strftime("%Y%m%d_%H%M%S")
                outs = sample_images(session, args, save_dir=save_dir)
                dt = time.time() - t0
                print(f"[demo] {args.sampler_name} {args.sample_steps} steps "
                      f"{args.H}x{args.W} x{args.num_samples}: {dt:.1f}s "
                      f"-> {save_dir}")
                msg = (f"{len(outs)} sample(s) in {dt:.1f}s "
                       f"(saved to {save_dir})")
                self._send(200, render_form(state, message=msg,
                                            images_b64=[_png_b64(o) for o in outs]))
            except Exception as e:  # report, keep serving
                self._send(500, render_form(state, message=f"error: {e}"))

    return Handler


def parse_versions(args) -> Dict[str, Dict[str, str]]:
    """--version name=config[:ckpt] entries; --config_path is the default."""
    versions: Dict[str, Dict[str, str]] = {}
    if args.config_path:
        versions[Path(args.config_path).stem] = {
            "config": args.config_path, "ckpt": args.ckpt_path}
    for spec in args.version or []:
        name, _, rest = spec.partition("=")
        config, _, ckpt = rest.partition(":")
        versions[name] = {"config": config, "ckpt": ckpt}
    if not versions:
        raise SystemExit("pass --config_path or at least one --version")
    return versions


def serve(state: DemoState, host: str, port: int) -> HTTPServer:
    server = HTTPServer((host, port), make_handler(state))
    return server


def main():
    p = add_image_args(argparse.ArgumentParser(), config_required=False)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--version", action="append", default=[],
                   help="extra model version: name=config.yaml[:ckpt]")
    args = p.parse_args()
    state = DemoState(args, parse_versions(args))
    server = serve(state, args.host, args.port)
    print(f"[demo] serving on http://{args.host}:{server.server_address[1]} "
          f"(versions: {', '.join(state.versions)})")
    server.serve_forever()


if __name__ == "__main__":
    main()

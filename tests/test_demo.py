"""Web demo UI (cli/demo.py) — the stdlib-HTTP equivalent of the reference's
streamlit demo (scripts/demo/sampling.py + streamlit_helpers.py).

Contracts under test:
  * GET / renders the widget surface (version/sampler/discretization/guider);
  * POST /generate (urlencoded txt2img) runs the shared sampling_image core,
    writes sample_NNN.png, and embeds results in the response page;
  * multipart img2img uploads reach the init_image path;
  * the model session is cached across requests (init_st semantics);
  * parse_multipart round-trips fields and file payloads.
"""

import argparse
import io
import json
import threading
import urllib.request
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from test_cli_pipeline import make_cli_engine

from ccedit_tpu.cli import demo
from ccedit_tpu.cli.sampling_image import ImageSession, add_image_args


@pytest.fixture()
def tiny_state(monkeypatch, tmp_path):
    builds = {"n": 0}

    def fake_build(args):
        builds["n"] += 1
        engine = make_cli_engine()
        import jax

        params = engine.init_params(jax.random.PRNGKey(0), {
            "txt": ["x"],
            "control_hint": np.zeros((1, 1, 64, 64, 3), np.float32),
        })
        return ImageSession(engine=engine, params=params, video_mode=True)

    monkeypatch.setattr(demo, "build_image_session", fake_build)
    base = add_image_args(argparse.ArgumentParser(), config_required=False
                          ).parse_args([])
    base.H = base.W = 64
    base.sample_steps = 2
    base.save_path = str(tmp_path / "out")
    state = demo.DemoState(base, {"tiny": {"config": "unused.yaml"}})
    state._builds = builds
    return state


@pytest.fixture()
def server(tiny_state):
    srv = demo.serve(tiny_state, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", tiny_state
    srv.shutdown()


class TestDemoServer:
    def test_form_renders_widget_surface(self, server):
        url, _ = server
        page = urllib.request.urlopen(url + "/").read().decode()
        for widget in ("version", "sampler_name", "discretization", "guider",
                       "prompt", "img2img_strength", "init_image"):
            assert widget in page
        assert "DPMPP2SAncestralSampler" in page and "legacy_ddpm" in page
        health = json.loads(urllib.request.urlopen(url + "/health").read())
        assert health == {"status": "ok"}

    @pytest.mark.slow
    def test_txt2img_roundtrip_and_session_cache(self, server):
        url, state = server
        form = ("version=tiny&prompt=a+bear&seed=1&H=64&W=64&sample_steps=2"
                "&num_samples=1&sampler_name=EulerEDMSampler"
                "&discretization=legacy_ddpm&guider=VanillaCFG&cfg_scale=5.0")
        page = urllib.request.urlopen(
            url + "/generate", data=form.encode()).read().decode()
        assert "sample(s) in" in page and "data:image/png;base64," in page
        outs = list(Path(state.base_args.save_path).rglob("sample_*.png"))
        assert len(outs) == 1
        arr = np.asarray(Image.open(outs[0]))
        assert arr.shape == (64, 64, 3)

        # second request: same warm session (init_st caching), new output
        urllib.request.urlopen(url + "/generate", data=form.encode()).read()
        assert state._builds["n"] == 1
        assert len(list(Path(state.base_args.save_path).rglob("*.png"))) == 2

    def test_img2img_multipart_upload(self, server):
        url, state = server
        buf = io.BytesIO()
        Image.fromarray(
            np.full((64, 64, 3), 128, np.uint8)).save(buf, format="PNG")
        boundary = "demoboundary123"
        parts = []
        for k, v in (("version", "tiny"), ("prompt", "edit"), ("seed", "2"),
                     ("H", "64"), ("W", "64"), ("sample_steps", "2"),
                     ("num_samples", "1"), ("img2img_strength", "0.5"),
                     ("sampler_name", "EulerAncestralSampler"),
                     ("discretization", "legacy_ddpm"),
                     ("guider", "IdentityGuider"), ("cfg_scale", "7.5")):
            parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                         f"name=\"{k}\"\r\n\r\n{v}\r\n".encode())
        parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                     f"name=\"init_image\"; filename=\"init.png\"\r\n"
                     f"Content-Type: image/png\r\n\r\n".encode()
                     + buf.getvalue() + b"\r\n")
        parts.append(f"--{boundary}--\r\n".encode())
        body = b"".join(parts)
        req = urllib.request.Request(
            url + "/generate", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        page = urllib.request.urlopen(req).read().decode()
        assert "sample(s) in" in page

    def test_error_is_reported_not_fatal(self, server):
        url, _ = server
        form = "version=missing&prompt=x"
        try:
            urllib.request.urlopen(url + "/generate", data=form.encode())
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error:" in e.read().decode()
        # server still answers
        assert urllib.request.urlopen(url + "/health").status == 200


class TestMultipartParser:
    def test_fields_and_files(self):
        boundary = "xyz"
        body = (b"--xyz\r\nContent-Disposition: form-data; name=\"a\"\r\n\r\n"
                b"hello\r\n"
                b"--xyz\r\nContent-Disposition: form-data; name=\"f\"; "
                b"filename=\"x.bin\"\r\n\r\n\x00\x01\xff\r\n"
                b"--xyz--\r\n")
        fields, files = demo.parse_multipart(
            body, f"multipart/form-data; boundary={boundary}")
        assert fields == {"a": "hello"}
        assert files == {"f": b"\x00\x01\xff"}

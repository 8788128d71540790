"""HTTP text-to-image server (rebuild of reference
``tools/inference_server.py``).

The reference uses LitServe + FastAPI (and imports a removed auraflow
package); litserve is not available here, so the same API surface —
``POST /predict`` with a JSON body, webp bytes back — is served by a
threaded stdlib HTTP server. On TPU the sampler jits per (shape, steps)
and the compile cache makes repeat shapes fast, replacing the reference's
torch.compile max-autotune warmup.
"""

import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from io import BytesIO
from pathlib import Path
from threading import Lock

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import click
import yaml
from pydantic import BaseModel, field_validator

DEFAULT_NEGATIVE = (
    "bad quality, worst quality, lowres, bad anatomy, sketch, jpeg "
    "artifacts, ugly, poorly drawn, signature, watermark"
)


class GenerationParams(BaseModel):
    """Reference ``inference_server.py:19-31``."""

    prompt: str
    negative_prompt: str = DEFAULT_NEGATIVE
    inference_steps: int = 25
    cfg_scale: float = 6.5
    width: int = 768
    height: int = 1024
    seed: int | None = None

    @field_validator("width", "height")
    @classmethod
    def check_divisible_by_64(cls, value):
        if value % 64 != 0:
            raise ValueError(f"{value} is not divisible by 64")
        return value


class T2IModel:
    """Reference ``inference_server.py:34-100``, SDXL-targeted."""

    def __init__(self, config_path: str, peft_path: str | None = None):
        from vision_pt_tpu.config import TrainConfig
        from vision_pt_tpu.models.sdxl import SDXLConfig, SDXLModel

        with open(config_path) as f:
            config = TrainConfig(**yaml.safe_load(f))
        model_config = SDXLConfig.model_validate(config.model)
        self.model = SDXLModel.from_checkpoint(model_config)
        if peft_path is not None:
            from safetensors.numpy import load_file

            from vision_pt_tpu.models.sdxl.convert import (
                convert_from_original_key,
            )
            from vision_pt_tpu.peft import load_peft_weight

            print(f"Loading PEFT weights from {peft_path}")
            peft_dict = {
                convert_from_original_key(k): v
                for k, v in load_file(peft_path).items()
            }
            load_peft_weight(self.model, peft_dict)
        self._lock = Lock()  # one TPU program at a time

    def generate(self, params: GenerationParams) -> bytes:
        with self._lock:
            image = self.model.generate(
                prompt=params.prompt,
                negative_prompt=params.negative_prompt,
                num_inference_steps=params.inference_steps,
                cfg_scale=params.cfg_scale,
                width=params.width,
                height=params.height,
                seed=params.seed,
            )[0]
        buf = BytesIO()
        image.save(buf, format="WEBP", quality=90)
        return buf.getvalue()


def make_handler(model: T2IModel):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path.rstrip("/") != "/predict":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                params = GenerationParams.model_validate_json(
                    self.rfile.read(length)
                )
            except Exception as e:  # noqa: BLE001 - surface as 422
                self.send_response(422)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())
                return
            try:
                body = model.generate(params)
            except Exception as e:  # noqa: BLE001 - surface as 500
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/webp")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") == "/health":
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"status": "ok"}')
            else:
                self.send_error(404)

        def log_message(self, fmt, *args):
            print(f"[server] {fmt % args}")

    return Handler


def serve(model: T2IModel, host: str, port: int) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(model))
    print(f"Serving on http://{host}:{port} (POST /predict, GET /health)")
    return server


@click.command()
@click.option("--config", "config_path", type=str, required=True)
@click.option("--peft-path", type=str, default=None)
@click.option("--host", type=str, default="0.0.0.0")
@click.option("--port", type=int, default=8123)
def main(config_path: str, peft_path: str | None, host: str, port: int):
    model = T2IModel(config_path, peft_path)
    serve(model, host, port).serve_forever()


if __name__ == "__main__":
    main()

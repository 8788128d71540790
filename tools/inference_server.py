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
import queue
import sys
import threading
from concurrent.futures import Future
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


class Batcher:
    """Dynamic micro-batching (the LitServe ``max_batch_size`` feature the
    reference's server gets from its framework): concurrent requests whose
    compiled-program key matches — (width, height, steps, cfg_scale), plus
    seedlessness — are grouped for up to ``max_delay_ms`` and run as ONE
    batched sampler call. Batch-8 sampling is ~4-5x the per-image
    throughput of eight sequential batch-1 calls on the v5e (the CFG
    doubled matmuls are far from MXU-saturating at batch 1). Requests with
    an explicit seed run alone (per-sample seeds can't mix in one
    ``incremental_seed_randn`` stream).
    """

    def __init__(self, generate_batch, max_batch: int = 8,
                 max_delay_ms: float = 60.0):
        self._generate_batch = generate_batch
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    @staticmethod
    def batch_key(params: "GenerationParams"):
        # one compiled sampler program per key; seeded requests are unique
        return (
            params.width, params.height, params.inference_steps,
            params.cfg_scale,
            # None and 1 must not collide (True == 1 in Python): a seeded
            # request may never be folded into a seedless batch
            ("noseed",) if params.seed is None else ("seed", params.seed),
        )

    def submit(self, params: "GenerationParams") -> Future:
        fut: Future = Future()
        self._q.put((params, fut))
        return fut

    def _collect(self):
        """One group: the oldest request plus same-key requests arriving
        within the delay window (non-matching requests are re-queued)."""
        first_params, first_fut = self._q.get()
        group = [(first_params, first_fut)]
        if first_params.seed is not None:
            return group  # seeded: run alone
        key = self.batch_key(first_params)
        import time as _time

        t_end = _time.monotonic() + self.max_delay
        requeue = []
        while len(group) < self.max_batch:
            timeout = t_end - _time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if self.batch_key(item[0]) == key:
                group.append(item)
            else:
                requeue.append(item)
        for item in requeue:
            self._q.put(item)
        return group

    def _loop(self):
        while True:
            group = self._collect()
            params = [p for p, _ in group]
            try:
                results = self._generate_batch(params)
                assert len(results) == len(group)
                for (_, fut), result in zip(group, results):
                    fut.set_result(result)
            except Exception as e:  # noqa: BLE001 - delivered per-request
                for _, fut in group:
                    if not fut.done():
                        fut.set_exception(e)


class T2IModel:
    """Reference ``inference_server.py:34-100``, SDXL-targeted."""

    def __init__(self, config_path: str, peft_path: str | None = None,
                 max_batch: int = 8, max_delay_ms: float = 60.0):
        from vision_pt_tpu.config import TrainConfig
        from vision_pt_tpu.models.sdxl import SDXLConfig, SDXLModel

        with open(config_path) as f:
            config = TrainConfig(**yaml.safe_load(f))
        model_config = SDXLConfig.model_validate(config.model)
        self.model = SDXLModel.from_checkpoint(model_config)
        self.batcher = Batcher(self._generate_batch, max_batch, max_delay_ms)
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

    def _generate_batch(self, params_list: list[GenerationParams]) -> list[bytes]:
        """One sampler call for the whole group (the Batcher guarantees
        matching width/height/steps/cfg; prompts and negatives vary
        per-sample)."""
        head = params_list[0]
        with self._lock:
            images = self.model.generate(
                prompt=[p.prompt for p in params_list],
                negative_prompt=[p.negative_prompt for p in params_list],
                num_inference_steps=head.inference_steps,
                cfg_scale=head.cfg_scale,
                width=head.width,
                height=head.height,
                seed=head.seed,
            )
        out = []
        for image in images:
            buf = BytesIO()
            image.save(buf, format="WEBP", quality=90)
            out.append(buf.getvalue())
        return out

    def generate(self, params: GenerationParams) -> bytes:
        return self.batcher.submit(params).result()


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

"""Tools suite tests (reference ``tools/``): CLI entry points driven
end-to-end where no pretrained weights are needed."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]


def run_tool(*args):
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True, cwd=REPO,
        timeout=600,
    )


def test_images_to_gif(tmp_path):
    for i in range(3):
        Image.new("RGB", (16, 16), (i * 40, 0, 0)).save(
            tmp_path / f"{i:03d}.png"
        )
    out = tmp_path / "anim.gif"
    r = run_tool("tools/visualize/images_to_gif.py", "-i", str(tmp_path),
                 "-o", str(out))
    assert r.returncode == 0, r.stderr
    gif = Image.open(out)
    gif.seek(2)  # 3 frames exist


@pytest.mark.slow
def test_inspect_and_change_dtype(tmp_path):
    from safetensors.numpy import load_file, save_file

    src = tmp_path / "w.safetensors"
    save_file({"a.weight": np.ones((4, 4), np.float32),
               "b.ids": np.arange(3, dtype=np.int64)}, str(src))
    r = run_tool("tools/model/inspect_weights.py", "-i", str(src), "--stats")
    assert r.returncode == 0, r.stderr
    assert "a.weight  (4, 4)" in r.stdout

    dst = tmp_path / "w_bf16.safetensors"
    r = run_tool("tools/checkpoint/change_dtype.py", "-i", str(src),
                 "-o", str(dst), "--dtype", "bfloat16")
    assert r.returncode == 0, r.stderr
    out = load_file(str(dst))
    assert str(out["a.weight"].dtype) in ("bfloat16", "uint16")
    assert out["b.ids"].dtype == np.int64  # ints untouched


def test_to_safetensors(tmp_path):
    import torch

    pt = tmp_path / "model.pt"
    torch.save({"state_dict": {"w": torch.ones(2, 2)}}, pt)
    out = tmp_path / "model.safetensors"
    r = run_tool("tools/checkpoint/to_safetensors.py", "-i", str(pt),
                 "-o", str(out))
    assert r.returncode == 0, r.stderr
    from safetensors.numpy import load_file

    assert load_file(str(out))["w"].shape == (2, 2)


@pytest.mark.slow
def test_expand_patch_embed(tmp_path):
    from safetensors.numpy import load_file, save_file

    rng = np.random.default_rng(0)
    sd = {
        "denoiser.patch_embedder.proj_1.weight":
            rng.standard_normal((32, 3, 16, 16)).astype(np.float32),
        "denoiser.final_layer.linear.weight":
            rng.standard_normal((16 * 16 * 3, 32)).astype(np.float32),
        "denoiser.final_layer.linear.bias":
            rng.standard_normal((16 * 16 * 3,)).astype(np.float32),
    }
    src = tmp_path / "jit.safetensors"
    save_file(sd, str(src))
    out = tmp_path / "jit32.safetensors"
    r = run_tool("tools/model/expand_patch_embed.py", "-i", str(src),
                 "-o", str(out), "-p", "32")
    assert r.returncode == 0, r.stderr
    new = load_file(str(out))
    assert new["denoiser.patch_embedder.proj_1.weight"].shape == (32, 3, 32, 32)
    assert new["denoiser.final_layer.linear.weight"].shape == (32 * 32 * 3, 32)
    assert new["denoiser.final_layer.linear.bias"].shape == (32 * 32 * 3,)


@pytest.mark.slow
def test_quantize_model_tool(tmp_path):
    from safetensors.numpy import load_file, save_file

    rng = np.random.default_rng(0)
    sd = {
        "model.diffusion_model.blk.weight":
            rng.standard_normal((64, 128)).astype(np.float32),
        "model.diffusion_model.out.weight":
            rng.standard_normal((8, 8)).astype(np.float32),
    }
    src = tmp_path / "unet.safetensors"
    save_file(sd, str(src))
    out = tmp_path / "unet.nf4.safetensors"
    r = run_tool("tools/quantize_model.py", "--model-path", str(src),
                 "--save-path", str(out), "--quant-type", "bnb_nf4")
    assert r.returncode == 0, r.stderr
    quantized = load_file(str(out))
    assert any("quant_state" in k for k in quantized)
    # excluded key untouched
    np.testing.assert_allclose(
        quantized["model.diffusion_model.out.weight"],
        sd["model.diffusion_model.out.weight"],
    )


def test_create_label2id(tmp_path):
    tags = tmp_path / "tags"
    tags.mkdir()
    for i in range(5):
        (tags / f"{i}.json").write_text(json.dumps({
            "rating": "general",
            "character_tags": {"miku": 1} if i < 3 else {},
            "general_tags": {"1girl": 1, "rare_tag": 1} if i < 4 else
                            {"1girl": 1},
        }))
    out = tmp_path / "label2id.json"
    r = run_tool("tools/data/create_label2id.py", "-t", str(tags),
                 "-o", str(out), "-g", "5", "-c", "1")
    assert r.returncode == 0, r.stderr
    label2id = json.loads(out.read_text())
    assert "general" in label2id and "miku" in label2id
    assert "1girl" in label2id  # count 5 >= threshold 5
    assert "rare_tag" not in label2id  # count 4 < threshold


def test_create_buckets_cache(tmp_path):
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(3):
        Image.new("RGB", (64 + i * 8, 48)).save(folder / f"{i}.png")
        (folder / f"{i}.txt").write_text("caption")
    out = tmp_path / "cache.jsonl"
    r = run_tool("tools/data/create_buckets_cache.py", "-i", str(folder),
                 "-o", str(out))
    assert r.returncode == 0, r.stderr
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(rows) == 3
    assert rows[0]["width"] in (64, 72, 80)


@pytest.mark.slow
def test_inference_server_http_roundtrip():
    """Drive POST /predict over a real socket with a tiny model."""
    import threading
    import urllib.request

    import jax.numpy as jnp

    from tests.training.test_sdxl_workload import (
        TINY_UNET,
        TINY_VAE,
        _install_tiny_text_encoders,
    )
    from vision_pt_tpu.models.sdxl import SDXLConfig, SDXLModel

    sys.path.insert(0, str(REPO / "tools"))
    import inference_server

    model = SDXLModel(SDXLConfig(
        checkpoint_path="", dtype="float32",
        denoiser=TINY_UNET, vae_config=TINY_VAE,
    ))
    _install_tiny_text_encoders(model)

    t2i = inference_server.T2IModel.__new__(inference_server.T2IModel)
    t2i.model = model
    import threading as _t

    t2i._lock = _t.Lock()
    t2i.batcher = inference_server.Batcher(
        t2i._generate_batch, max_batch=4, max_delay_ms=30.0
    )

    # patch generate to pin fp32 (the tiny test model is fp32)
    orig_generate = model.generate

    def fp32_generate(**kw):
        kw["execution_dtype"] = jnp.float32
        return orig_generate(**kw)

    model.generate = fp32_generate

    server = inference_server.serve(t2i, "127.0.0.1", 0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health"
        ) as resp:
            assert json.loads(resp.read())["status"] == "ok"

        body = json.dumps({
            "prompt": "a cat", "width": 64, "height": 64,
            "inference_steps": 2, "cfg_scale": 3.0, "seed": 1,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.headers["Content-Type"] == "image/webp"
            data = resp.read()
        from io import BytesIO

        img = Image.open(BytesIO(data))
        assert img.size == (64, 64)

        # malformed body -> 422, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b'{"width": 63}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(bad)
        assert exc_info.value.code == 422
    finally:
        server.shutdown()


def test_server_batcher_groups_compatible_requests():
    """Concurrent seedless requests with one compiled-program key run as
    ONE batched call; mismatched shapes and seeded requests do not mix."""
    import time

    sys.path.insert(0, str(REPO / "tools"))
    import inference_server

    calls = []

    def fake_generate(params_list):
        calls.append([p.prompt for p in params_list])
        time.sleep(0.02)
        return [f"img:{p.prompt}".encode() for p in params_list]

    batcher = inference_server.Batcher(
        fake_generate, max_batch=4, max_delay_ms=80.0
    )
    P = inference_server.GenerationParams
    same = dict(width=64, height=64, inference_steps=2, cfg_scale=3.0)

    futs = [batcher.submit(P(prompt=f"p{i}", **same)) for i in range(3)]
    other = batcher.submit(P(prompt="odd", width=128, height=64,
                             inference_steps=2, cfg_scale=3.0))
    seeded = batcher.submit(P(prompt="seeded", seed=7, **same))

    results = [f.result(timeout=10) for f in futs]
    assert results == [b"img:p0", b"img:p1", b"img:p2"]
    assert other.result(timeout=10) == b"img:odd"
    assert seeded.result(timeout=10) == b"img:seeded"

    # the three compatible requests were grouped (one call), the
    # incompatible and seeded ones ran alone
    grouped = [c for c in calls if len(c) > 1]
    assert grouped and set(grouped[0]) <= {"p0", "p1", "p2"}
    assert ["odd"] in calls and ["seeded"] in calls


def test_server_batch_key_never_mixes_seed1_with_seedless():
    sys.path.insert(0, str(REPO / "tools"))
    import inference_server

    P = inference_server.GenerationParams
    same = dict(prompt="x", width=64, height=64, inference_steps=2,
                cfg_scale=3.0)
    # True == 1 in Python: a naive `seed is None or seed` key collides
    assert (inference_server.Batcher.batch_key(P(seed=1, **same))
            != inference_server.Batcher.batch_key(P(seed=None, **same)))
    assert (inference_server.Batcher.batch_key(P(seed=None, **same))
            == inference_server.Batcher.batch_key(P(seed=None, **same)))


def test_server_batcher_delivers_exceptions_per_request():
    sys.path.insert(0, str(REPO / "tools"))
    import inference_server

    def broken_generate(params_list):
        raise RuntimeError("boom")

    batcher = inference_server.Batcher(
        broken_generate, max_batch=2, max_delay_ms=10.0
    )
    fut = batcher.submit(inference_server.GenerationParams(
        prompt="x", width=64, height=64, inference_steps=1, cfg_scale=1.5,
    ))
    with pytest.raises(RuntimeError, match="boom"):
        fut.result(timeout=10)


def test_compiled_memory_analysis():
    """Static XLA memory accounting (the TPU substitute for the reference's
    CUDA allocator snapshots — tools/bench/sdxl_quant.py matrix)."""
    import jax
    import jax.numpy as jnp

    from vision_pt_tpu.utils.memory import (
        compiled_memory_analysis,
        format_bytes,
        peak_hbm_record,
    )

    @jax.jit
    def f(x):
        return (x @ x.T).sum(axis=0)

    x = jnp.zeros((256, 512), dtype=jnp.float32)
    mem = compiled_memory_analysis(f, x)
    assert mem is not None
    assert mem["argument_bytes"] >= 256 * 512 * 4
    assert mem["total_bytes"] > 0
    assert "MiB" in format_bytes(mem["argument_bytes"]) or "KiB" in format_bytes(
        mem["argument_bytes"]
    )

    rec = peak_hbm_record(f, x)
    assert rec["static"]["total_bytes"] == mem["total_bytes"]

import numpy as np
import pytest

from vision_pt_tpu.preview import PreviewStrategy
from vision_pt_tpu.saving import (
    ModelSavingStrategy,
    SafetensorsSavingCallback,
)


class TestSavingStrategy:
    """Truth table per reference ``src/saving/util.py:108-124``."""

    def test_per_epochs_int(self):
        s = ModelSavingStrategy(
            total_epochs=4, steps_per_epoch=10, per_epochs=2, per_steps=None,
            save_last=True,
        )
        assert not s.should_save(0, 0)
        assert not s.should_save(1, 10)
        assert s.should_save(2, 20)
        assert not s.should_save(3, 30)
        assert s.should_save(4, 40)

    def test_per_steps(self):
        s = ModelSavingStrategy(
            total_epochs=2, steps_per_epoch=10, per_epochs=None, per_steps=7,
            save_last=True,
        )
        assert not s.should_save(1, 5)
        assert s.should_save(1, 7)
        assert s.should_save(2, 14)

    def test_per_epochs_fraction(self):
        s = ModelSavingStrategy(
            total_epochs=1, steps_per_epoch=100, per_epochs=0.5, per_steps=None,
            save_last=True,
        )
        assert s.should_save(1, 50)
        assert s.should_save(1, 100)
        assert not s.should_save(1, 30)

    def test_invalid_configs(self):
        with pytest.raises(ValueError):
            ModelSavingStrategy(1, 10, per_epochs=0, per_steps=None, save_last=True)
        with pytest.raises(ValueError):
            ModelSavingStrategy(1, 10, per_epochs=1.5, per_steps=None, save_last=True)
        with pytest.raises(ValueError):
            ModelSavingStrategy(1, 10, per_epochs=0.5, per_steps=5, save_last=True)
        with pytest.raises(ValueError):
            ModelSavingStrategy(1, 10, per_epochs=None, per_steps=100, save_last=True)


def test_safetensors_callback_roundtrip(tmp_path):
    cb = SafetensorsSavingCallback(name="m", save_dir=str(tmp_path))
    sd = {"a.weight": np.ones((2, 2), dtype=np.float32)}
    path = cb.save(sd, epoch=3, steps=42, metadata={"k": "v"})
    assert path.name == "m_00003e_000042s.safetensors"
    from safetensors.numpy import load_file

    loaded = load_file(str(path))
    np.testing.assert_array_equal(loaded["a.weight"], sd["a.weight"])


def test_preview_strategy():
    s = PreviewStrategy(total_epochs=2, steps_per_epoch=10, per_epochs=1, per_steps=None)
    assert not s.should_preview(0, 0)
    assert s.should_preview(1, 10)
    assert s.should_preview(2, 20)
    assert not s.should_preview(1, 5)


def test_grid_video_safetensors_utils(tmp_path):
    import numpy as np
    from PIL import Image

    from vision_pt_tpu.utils.grid import images_to_grid_image
    from vision_pt_tpu.utils.safetensors import load_file_with_rename_key_map
    from vision_pt_tpu.utils.video import write_images_as_video

    imgs = [Image.new("RGB", (16, 16), (i * 50, 0, 0)) for i in range(5)]
    grid = images_to_grid_image(imgs, padding=2)
    # 5 images -> 2 cols x 3 rows
    assert grid.size == (2 * 18 + 2, 3 * 18 + 2)

    video_path = str(tmp_path / "out.mp4")
    written = write_images_as_video(imgs, video_path, fps=4)
    import os

    assert os.path.getsize(written) > 0

    from safetensors.numpy import save_file

    save_file({"old.a": np.ones(2, np.float32)}, str(tmp_path / "w.st"))
    sd = load_file_with_rename_key_map(
        tmp_path / "w.st", {"old.": "new."}
    )
    assert "new.a" in sd

"""Dataset download entry points (rebuild of reference
``tools/data/dl_{konachan,safebooru,safebooru_parquet,styled_images}.py``).

The reference downloads via cheesechaser / HF parquet streams. This
environment has ZERO network egress, so these are explicit gates: they
document the expected on-disk layout and fail with a clear message instead
of hanging on sockets."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import click

LAYOUT = """Expected on-disk layout (produce it on a machine with egress):
  <out>/<id>.<ext>          the image
  <out>/<id>.txt            caption (comma-separated tags), and/or
  <out>/<id>.json           metadata: {rating, character_tags, general_tags,
                            copyright_tags, people, meta}
Then point TextToImageDatasetConfig.folder (or the referenced variant) at it.
"""


@click.command()
@click.option("--source", type=click.Choice(
    ["konachan", "safebooru", "safebooru_parquet", "styled_images"]),
    required=True)
@click.option("--output", "-o", type=str, required=True)
def main(source: str, output: str):
    raise SystemExit(
        f"Downloading from {source!r} needs network egress, which this "
        f"environment does not have.\n\n{LAYOUT}"
    )


if __name__ == "__main__":
    main()

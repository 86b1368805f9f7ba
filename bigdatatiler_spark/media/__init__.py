"""Media codecs for the multimodal pipeline (no external libraries).

``png`` implements a minimal, spec-correct PNG encoder/decoder on the
standard library alone (zlib + struct), so the multimodal decode stage
can run on REAL image bytes even in environments without PIL/ffmpeg.
When PIL is importable it is preferred (``probe_pil``)."""

from .png import decode_png, encode_png, probe_pil  # noqa: F401

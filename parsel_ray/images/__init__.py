"""Image column support: codecs, perceptual hash, verification kernels.

Images travel as opaque ``binary`` cells with typed metadata
(``w h fmt``) per the corpus schema (image_id, bytes, w, h, fmt, caption,
phash).  Codecs are stdlib+numpy only (no PIL in the environment):

* ``ppm``  — binary PPM (P6), lossless;
* ``png``  — minimal RGB8 PNG (zlib, filter 0), lossless;
* ``qjpg`` — toy lossy codec (5-bit per-channel quantization + zlib),
  PSNR ≈ 40.8 dB — exercises the lossy verification path honestly.
"""

from .codecs import decode_image, encode_image, phash64, psnr

__all__ = ["decode_image", "encode_image", "phash64", "psnr"]

"""Cross-IMPLEMENTATION codec validation against the JVM's javax.imageio.

The round-trip and property tests prove our encoders and decoders are
mutually consistent — but a transcription error in a SHARED constant
(zigzag order, a Huffman table entry, a filter rule) would round-trip
cleanly and still misread every real-world file. The Spark JVM ships a
completely independent codec suite (javax.imageio: PNG, baseline JPEG,
GIF), already in-process via py4j, so each format is checked in BOTH
directions against it:

- ImageIO-encoded bytes through OUR decoders (the direction production
  traffic takes: files we did not write);
- OUR encoders' bytes through ImageIO (proves the streams are
  spec-conformant to an implementation that has never seen our code).

PNG and GIF are lossless -> byte-exact both ways. JPEG is lossy, so
the checks bound the error: tight on constant images (DC-only),
looser on gradients (AC quantization at ImageIO's default quality).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR  # noqa: F401  (ensures package path setup)


@pytest.fixture(scope="module")
def jvm_img(spark):
    """Small helper bundle over the Spark JVM's imageio."""
    from py4j.java_gateway import java_import

    jvm = spark._jvm
    java_import(jvm, "java.awt.image.BufferedImage")
    java_import(jvm, "javax.imageio.ImageIO")
    java_import(jvm, "java.io.ByteArrayOutputStream")
    java_import(jvm, "java.io.ByteArrayInputStream")
    gateway = spark.sparkContext._gateway

    def to_bytes(px: np.ndarray, fmt: str) -> bytes:
        h, w = px.shape[:2]
        bi = jvm.BufferedImage(w, h, 1)  # TYPE_INT_RGB
        arr = gateway.new_array(gateway.jvm.int, w * h)
        flat = px.reshape(-1, 3).astype(np.int64)
        packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
        for i, v in enumerate(packed):
            arr[i] = int(v)
        bi.setRGB(0, 0, w, h, arr, 0, w)
        baos = jvm.ByteArrayOutputStream()
        assert jvm.ImageIO.write(bi, fmt, baos)
        return bytes(baos.toByteArray())

    def from_bytes(data: bytes) -> np.ndarray:
        bis = jvm.ByteArrayInputStream(bytearray(data))
        bi = jvm.ImageIO.read(bis)
        assert bi is not None, "ImageIO could not parse our stream"
        w, h = bi.getWidth(), bi.getHeight()
        arr = gateway.new_array(gateway.jvm.int, w * h)
        bi.getRGB(0, 0, w, h, arr, 0, w)
        packed = np.array([arr[i] for i in range(w * h)], dtype=np.int64)
        out = np.stack(
            [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF], axis=-1
        )
        return out.reshape(h, w, 3).astype(np.uint8)

    return to_bytes, from_bytes


def test_png_cross_implementation(jvm_img):
    """ImageIO PNGs decode byte-exact in our decoder; our PNGs (all
    five filters in play) read byte-exact in ImageIO."""
    from k8e_fetch_spark.operators.png import decode_png, encode_png

    to_bytes, from_bytes = jvm_img
    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, (21, 33, 3), dtype=np.uint8)

    w, h, ch, raw = decode_png(to_bytes(img, "png"))
    assert (w, h, ch) == (33, 21, 3)
    assert np.array_equal(np.frombuffer(raw, np.uint8).reshape(21, 33, 3), img)

    ours = encode_png(33, 21, img.tobytes(), color_type=2)
    assert np.array_equal(from_bytes(ours), img)


def test_gif_cross_implementation(jvm_img):
    """ImageIO GIFs (few-color input, so no quantization) decode
    byte-exact in our decoder; our GIFs read byte-exact in ImageIO."""
    from k8e_fetch_spark.operators.gif import decode_gif, encode_gif

    to_bytes, from_bytes = jvm_img
    rng = np.random.RandomState(32)
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (40, 80, 120)]
    idx = rng.randint(0, 4, (17, 26))
    img = np.array(palette, dtype=np.uint8)[idx]

    w, h, n, frames = decode_gif(to_bytes(img, "gif"))
    assert (w, h, n) == (26, 17, 1)
    assert frames[0] == img.tobytes()

    ours = encode_gif(26, 17, palette, [bytes(idx.reshape(-1).tolist())])
    assert np.array_equal(from_bytes(ours), img)


def test_jpeg_cross_implementation(jvm_img):
    """Baseline JPEG against ImageIO, both directions, error-bounded:
    constant images are DC-only (tight bound even at ImageIO's default
    lossy quality); a smooth gradient bounds the AC path. Our encoder
    uses all-ones quantization, so ImageIO reading OUR bytes must land
    within the color-conversion rounding band."""
    from k8e_fetch_spark.operators.jpeg import decode_jpeg, encode_jpeg

    to_bytes, from_bytes = jvm_img

    const = np.zeros((24, 32, 3), dtype=np.uint8)
    const[...] = (120, 60, 200)
    w, h, nc, out = decode_jpeg(to_bytes(const, "jpg"))
    assert (w, h, nc) == (32, 24, 3)
    assert np.abs(out.astype(int) - const.astype(int)).max() <= 6

    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    grad = np.stack([(xx * 4) % 240, (yy * 6) % 240, ((xx + yy) * 3) % 240], axis=-1).astype(np.uint8)
    _, _, _, out = decode_jpeg(to_bytes(grad, "jpg"))
    diff = np.abs(out.astype(int) - grad.astype(int))
    assert diff.mean() <= 10 and diff.max() <= 64, (diff.mean(), diff.max())

    ones = np.ones((8, 8))
    ours = encode_jpeg(grad, quant_luma=ones, quant_chroma=ones)
    back = from_bytes(ours)
    diff = np.abs(back.astype(int) - grad.astype(int))
    assert diff.max() <= 4, diff.max()

    ours420 = encode_jpeg(const, quant_luma=ones, quant_chroma=ones, subsampling="4:2:0")
    assert np.abs(from_bytes(ours420).astype(int) - const.astype(int)).max() <= 2


def test_wav_cross_implementation(spark):
    """WAV against javax.sound.sampled, both directions: AudioSystem's
    RIFF output decodes sample-exact in our decoder (16-bit mono and
    stereo), and our streams parse to the identical PCM payload in an
    implementation that has never seen our code."""
    import struct

    from py4j.java_gateway import java_import

    from k8e_fetch_spark.operators.wav import decode_wav, encode_wav

    jvm = spark._jvm
    java_import(jvm, "javax.sound.sampled.*")
    java_import(jvm, "java.io.ByteArrayOutputStream")
    java_import(jvm, "java.io.ByteArrayInputStream")

    for channels in (1, 2):
        samples = [0, 1000, -1000, 32767, -32768, 42, -17, 255][: 8 - (8 % channels)]
        raw = struct.pack(f"<{len(samples)}h", *samples)
        fmt = jvm.AudioFormat(8000.0, 16, channels, True, False)
        ais = jvm.AudioInputStream(
            jvm.ByteArrayInputStream(bytearray(raw)), fmt, len(samples) // channels
        )
        baos = jvm.ByteArrayOutputStream()
        jvm.AudioSystem.write(ais, jvm.AudioFileFormat.Type.WAVE, baos)
        r, c, nf, out = decode_wav(bytes(baos.toByteArray()))
        assert (r, c, nf) == (8000, channels, len(samples) // channels)
        assert out == samples

        ours = encode_wav(8000, channels, samples)
        ais2 = jvm.AudioSystem.getAudioInputStream(jvm.ByteArrayInputStream(bytearray(ours)))
        f2 = ais2.getFormat()
        assert (int(f2.getSampleRate()), f2.getChannels(), f2.getSampleSizeInBits()) == (
            8000, channels, 16,
        )
        assert bytes(ais2.readAllBytes()) == raw

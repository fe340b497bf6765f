"""Progressive JPEG (SOF2) decode, cross-validated against an
INDEPENDENT codec: OpenJDK ImageIO's progressive encoder generates the
test streams at test time (javac/java ship with the Spark sandbox's JDK;
skip-marked elsewhere). Color streams compare against ImageIO's own
decode (TYPE_INT_RGB — colorspace-safe); grayscale compares against the
ORIGINAL pixels, because ImageIO's TYPE_BYTE_GRAY getRGB applies a
linear-gray->sRGB conversion that corrupts it as a reference."""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
import tempfile

import numpy as np
import pytest

from see_spark.core.jpeg import decode_jpeg

JAVA = shutil.which("java")
JAVAC = shutil.which("javac")

_JAVA_SRC = r"""
import javax.imageio.ImageIO;
import javax.imageio.IIOImage;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import java.awt.image.BufferedImage;
import java.io.*;

public class JpegProgTest {
    public static void main(String[] args) throws Exception {
        if (args[0].equals("encode")) {
            DataInputStream in = new DataInputStream(
                new BufferedInputStream(new FileInputStream(args[1])));
            int w = in.readInt(), h = in.readInt(), gray = in.readInt();
            BufferedImage img = new BufferedImage(w, h,
                gray == 1 ? BufferedImage.TYPE_BYTE_GRAY
                          : BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    if (gray == 1)
                        img.getRaster().setSample(x, y, 0, in.read());
                    else {
                        int r = in.read(), g = in.read(), b = in.read();
                        img.setRGB(x, y, (r << 16) | (g << 8) | b);
                    }
                }
            ImageWriter wr =
                ImageIO.getImageWritersByFormatName("jpeg").next();
            ImageWriteParam p = wr.getDefaultWriteParam();
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionQuality(Float.parseFloat(args[3]));
            p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
            FileOutputStream fos = new FileOutputStream(args[2]);
            wr.setOutput(ImageIO.createImageOutputStream(fos));
            wr.write(null, new IIOImage(img, null, null), p);
            fos.close();
        } else {
            BufferedImage img = ImageIO.read(new File(args[1]));
            DataOutputStream out = new DataOutputStream(
                new BufferedOutputStream(new FileOutputStream(args[2])));
            out.writeInt(img.getWidth()); out.writeInt(img.getHeight());
            for (int y = 0; y < img.getHeight(); y++)
                for (int x = 0; x < img.getWidth(); x++) {
                    int rgb = img.getRGB(x, y);
                    out.write((rgb >> 16) & 255);
                    out.write((rgb >> 8) & 255);
                    out.write(rgb & 255);
                }
            out.close();
        }
    }
}
"""


@pytest.fixture(scope="module")
def jx():
    if JAVA is None or JAVAC is None:
        pytest.skip("JDK (java + javac) not on PATH")
    d = tempfile.mkdtemp(prefix="see_jpeg_prog_")
    src = os.path.join(d, "JpegProgTest.java")
    with open(src, "w") as fh:
        fh.write(_JAVA_SRC)
    subprocess.run([JAVAC, "-d", d, src], check=True, timeout=120)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _encode(jx_dir, img, gray, quality, name):
    raw = os.path.join(jx_dir, name + ".bin")
    jpg = os.path.join(jx_dir, name + ".jpg")
    with open(raw, "wb") as fh:
        h, w = img.shape[:2]
        fh.write(struct.pack(">iii", w, h, 1 if gray else 0))
        fh.write(img.tobytes())
    subprocess.run(
        [JAVA, "-cp", jx_dir, "JpegProgTest", "encode", raw, jpg,
         str(quality)],
        check=True, timeout=120,
    )
    with open(jpg, "rb") as fh:
        return fh.read()


def _java_decode(jx_dir, data, name):
    jpg = os.path.join(jx_dir, name + ".jpg")
    out = os.path.join(jx_dir, name + ".out")
    with open(jpg, "wb") as fh:
        fh.write(data)
    subprocess.run(
        [JAVA, "-cp", jx_dir, "JpegProgTest", "decode", jpg, out],
        check=True, timeout=120,
    )
    with open(out, "rb") as fh:
        w, h = struct.unpack(">ii", fh.read(8))
        return np.frombuffer(fh.read(), dtype=np.uint8).reshape(h, w, 3)


def test_progressive_color_420_matches_imageio(jx):
    rng = np.random.default_rng(4)
    img = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    data = _encode(jx, img, gray=False, quality=0.9, name="c")
    assert b"\xff\xc2" in data  # really progressive
    ours = decode_jpeg(data).astype(float)
    ref = _java_decode(jx, data, "c").astype(float)
    # luma must agree closely; chroma differs by upsampling filter
    ly = 0.299 * ours[:, :, 0] + 0.587 * ours[:, :, 1] + 0.114 * ours[:, :, 2]
    ry = 0.299 * ref[:, :, 0] + 0.587 * ref[:, :, 1] + 0.114 * ref[:, :, 2]
    assert np.abs(ly - ry).mean() < 1.5


def test_progressive_smooth_color_close_to_original(jx):
    x = np.linspace(0, 255, 48)
    grad = np.stack(np.meshgrid(x, x), axis=2)
    img = np.concatenate(
        [grad, ((grad[:, :, 0] + grad[:, :, 1]) / 2)[:, :, None]], axis=2
    ).astype(np.uint8)
    data = _encode(jx, img, gray=False, quality=0.95, name="s")
    assert b"\xff\xc2" in data
    ours = decode_jpeg(data).astype(float)
    assert np.abs(ours - img.astype(float)).mean() < 3.0


def test_progressive_grayscale_close_to_original(jx):
    rng = np.random.default_rng(7)
    g = (rng.random((24, 40)) * 255).astype(np.uint8)
    data = _encode(jx, g, gray=True, quality=0.9, name="g")
    assert b"\xff\xc2" in data
    ours = decode_jpeg(data)
    assert ours.shape == (24, 40, 1)
    err = np.abs(ours[:, :, 0].astype(float) - g.astype(float))
    assert err.mean() < 5.0


def test_progressive_truncated_raises(jx):
    rng = np.random.default_rng(9)
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    data = _encode(jx, img, gray=False, quality=0.9, name="t")
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 3])

"""Benchmark the native C++ decoder vs PIL on dataset-shaped images.

Measures single-thread and 8-thread decode rates for:
  * converted-Cityscapes-shaped RGB PNGs (512x1024, the largest train decode)
  * VOC-shaped JPEG images (375x500 q95) and palette PNG labels
and writes a JSON evidence file (default
results_evidence/native_decode_bench.json).

Run: python scripts/native_decode_bench.py
"""

import io
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cutmix_seg_tpu.native import decode as nd  # noqa: E402


def make_payloads():
    rng = np.random.RandomState(0)

    def png(arr, mode=None):
        img = Image.fromarray(arr) if mode is None else Image.fromarray(arr, mode)
        b = io.BytesIO()
        img.save(b, "PNG")
        return b.getvalue()

    def jpeg(arr, q=95):
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "JPEG", quality=q)
        return b.getvalue()

    # photographic-ish content: smoothed noise compresses like real data
    def smooth(h, w):
        x = rng.randint(0, 256, (h // 8, w // 8, 3), np.uint8)
        return np.asarray(
            Image.fromarray(x).resize((w, h), Image.BILINEAR), np.uint8)

    city = smooth(512, 1024)
    voc = smooth(375, 500)
    label = rng.randint(0, 21, (375, 500), np.uint8)
    pal = Image.fromarray(label, "P")
    pal.putpalette([i % 256 for i in range(768)])
    b = io.BytesIO()
    pal.save(b, "PNG")
    return {
        "cityscapes_rgb_png_512x1024": png(city),
        "voc_jpeg_375x500": jpeg(voc),
        "voc_label_palette_png_375x500": b.getvalue(),
    }


def rate(fn, payload, n, threads=1):
    # warmup
    fn(payload)
    t0 = time.perf_counter()
    if threads == 1:
        for _ in range(n):
            fn(payload)
    else:
        with ThreadPoolExecutor(threads) as pool:
            list(pool.map(lambda _: fn(payload), range(n)))
    return n / (time.perf_counter() - t0)


def pil_decode(data):
    img = Image.open(io.BytesIO(data))
    img.load()
    return np.array(img)


def main():
    assert nd.native_available(), "native decoder failed to build"
    out = {"host_cpus": os.cpu_count(), "note":
           "images/sec decoding one in-memory payload repeatedly; "
           "native = C++ libpng/libjpeg-turbo via ctypes (GIL released), "
           "pil = PIL.Image.open + np.array. On this 1-CPU host the t8 rows "
           "only show GIL-contention relief; real TPU hosts with many cores "
           "additionally scale the native path near-linearly across loader "
           "threads."}
    n_by_kind = {"cityscapes_rgb_png_512x1024": 60,
                 "voc_jpeg_375x500": 200,
                 "voc_label_palette_png_375x500": 300}
    for name, payload in make_payloads().items():
        n = n_by_kind[name]
        np.testing.assert_array_equal(nd._decode_native(payload),
                                      pil_decode(payload))
        res = {}
        for threads in (1, 8):
            nat = rate(nd.decode_array, payload, n, threads)
            pil = rate(pil_decode, payload, n, threads)
            res[f"native_imgs_per_sec_t{threads}"] = round(nat, 1)
            res[f"pil_imgs_per_sec_t{threads}"] = round(pil, 1)
            res[f"speedup_t{threads}"] = round(nat / pil, 2)
        out[name] = res
        print(name, res, flush=True)
    path = os.path.join(os.path.dirname(__file__), "..",
                        "results_evidence", "native_decode_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", os.path.normpath(path))


if __name__ == "__main__":
    main()

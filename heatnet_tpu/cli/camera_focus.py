"""Camera focus helper: frequency-domain entropy per frame.

Reference: ``ros_src/camera_focus/kalibr_camera_focus:1-63`` — subscribes
to camera topics and prints the frequency-domain entropy (FDE, Kristan &
Pernuš "Entropy Based Measure of Camera Focus") of each frame: minimize it
while turning the lens. ROS subscription becomes a file/directory CLI (or
library use via :func:`frequency_domain_entropy` on live frames).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def frequency_domain_entropy(gray: np.ndarray) -> float:
    """FDE of a grayscale frame (kalibr_camera_focus:29-39 math).

    ``sum(p * log(p))`` over the normalized FFT magnitude spectrum —
    NEGATIVE entropy, so sharper focus → more spread spectrum → the value
    to MINIMIZE, exactly as the reference prints it.
    """
    img = np.asarray(gray, np.float64)
    if img.ndim == 3:
        img = img.mean(axis=-1)
    spectrum = np.abs(np.fft.fftshift(np.fft.fft2(img)))
    total = spectrum.sum()
    if total == 0:
        return 0.0
    p = spectrum / total
    with np.errstate(divide="ignore", invalid="ignore"):
        logp = np.where(p > 0, np.log(p), 0.0)
    return float(np.sum(p * logp))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Validate camera focus (minimize the printed FDE)")
    p.add_argument("--images", nargs="+", required=True,
                   help="image files or directories of frames")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    import cv2

    files = []
    for path in args.images:
        if os.path.isdir(path):
            files.extend(sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.lower().endswith((".png", ".jpg", ".jpeg"))))
        else:
            files.append(path)
    if not files:
        raise FileNotFoundError("no frames found")

    results = {}
    for f in files:
        img = cv2.imread(f, cv2.IMREAD_GRAYSCALE)
        fde = frequency_domain_entropy(img)
        results[f] = fde
        print(f"fde: {fde}   (minimize this for focus)  [{f}]")
    return results


if __name__ == "__main__":
    main()

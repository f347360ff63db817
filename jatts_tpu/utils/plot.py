"""Plot helpers for training artifacts (reference jatts/utils/plot.py:15-80)."""

from __future__ import annotations

import os

import numpy as np


def _ax():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_mel(mel: np.ndarray, path: str, title: str = "") -> None:
    plt = _ax()
    fig, ax = plt.subplots(figsize=(8, 3))
    im = ax.imshow(mel.T, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def plot_generated_and_ref(gen: np.ndarray, ref: np.ndarray, path: str) -> None:
    plt = _ax()
    fig, axes = plt.subplots(2, 1, figsize=(8, 6))
    for ax, m, title in zip(axes, [gen, ref], ["generated", "reference"]):
        im = ax.imshow(m.T, aspect="auto", origin="lower", interpolation="none")
        fig.colorbar(im, ax=ax)
        ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def plot_attention(attn: np.ndarray, path: str, title: str = "") -> None:
    plt = _ax()
    fig, ax = plt.subplots()
    im = ax.imshow(attn, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def plot_1d(x: np.ndarray, path: str, title: str = "") -> None:
    plt = _ax()
    fig, ax = plt.subplots()
    ax.plot(x)
    ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)

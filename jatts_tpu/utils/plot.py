"""Plot helpers for training artifacts (reference jatts/utils/plot.py:15-80)."""

from __future__ import annotations

import os

import numpy as np


def _ax():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _at_least_1col(m: np.ndarray) -> np.ndarray:
    """Zero-length sequences (degenerate eval rows) would give imshow a
    singular xlim; pad to one column so the artifact still renders."""
    m = np.atleast_2d(np.asarray(m))
    if m.shape[0] == 0:
        m = np.zeros((1, max(m.shape[1], 1)), m.dtype)
    if m.shape[1] == 0:
        m = np.zeros((m.shape[0], 1), m.dtype)
    return m


def plot_mel(mel: np.ndarray, path: str, title: str = "") -> None:
    plt = _ax()
    fig, ax = plt.subplots(figsize=(8, 3))
    im = ax.imshow(_at_least_1col(mel).T, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def plot_generated_and_ref(gen: np.ndarray, ref: np.ndarray, path: str) -> None:
    plt = _ax()
    fig, axes = plt.subplots(2, 1, figsize=(8, 6))
    for ax, m, title in zip(axes, [gen, ref], ["generated", "reference"]):
        im = ax.imshow(_at_least_1col(m).T, aspect="auto", origin="lower", interpolation="none")
        fig.colorbar(im, ax=ax)
        ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def plot_attention(attn: np.ndarray, path: str, title: str = "") -> None:
    plt = _ax()
    fig, ax = plt.subplots()
    im = ax.imshow(_at_least_1col(attn), aspect="auto", origin="lower", interpolation="none")
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

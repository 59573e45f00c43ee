"""Gif / plot / image-conversion helpers — counterpart of the reference's
`mj_envs_vision/utils/helpers.py:85-134` (to_image_frame, to_input_obs,
save_as_gif, plot_rewards with mean/median/sigma bands,
visualise_batch_from_experience, visualise_trajectory).

Pure host-side NumPy/PIL/matplotlib; safe to import without touching a
device.
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

GIF_DURATION = 150   # ms per frame (reference helpers.py GIF_DURATION)


def to_image_frame(obs: np.ndarray) -> np.ndarray:
    """Model-input image (C, H, W) pels in [-0.5, 0.5] -> (H, W, C) uint8
    [0, 255] (reference `helpers.py:88-90`)."""
    obs = np.asarray(obs)
    return (255 * (obs.transpose((1, 2, 0)) + 0.5)).astype("uint8")


def to_input_obs(frame: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 [0, 255] -> (C, H, W) float [-0.5, 0.5]
    (reference `helpers.py:92-94`)."""
    frame = np.asarray(frame)
    return (frame.transpose((2, 0, 1)) / 255 - 0.5).astype("float")


def save_as_gif(frames: Sequence[np.ndarray], gif_path: str,
                is_obs: bool = False) -> None:
    """Write frames as an animated gif (reference `helpers.py:96-101`).
    Frames are (H, W, 3) float/uint8 in [0, 255], or CHW [-0.5, 0.5]
    model observations when `is_obs`."""
    from PIL import Image
    pils = []
    for frame in frames:
        frame = np.asarray(frame)
        arr = to_image_frame(frame) if is_obs else frame.astype("uint8")
        pils.append(Image.fromarray(arr))
    os.makedirs(os.path.dirname(gif_path) or ".", exist_ok=True)
    pils[0].save(gif_path, append_images=pils[1:], save_all=True,
                 optimize=False, loop=True, duration=GIF_DURATION)


def plot_rewards(rewards: List[Tuple], yaxis_label: str = "total reward"):
    """Reward curve figure (reference `helpers.py:103-120`): one line for
    scalar-per-epoch data; mean (dashed) + median (solid) + mean±std band
    for vector-per-epoch data.  `rewards` = [(episode, value-or-values)].
    Returns the matplotlib figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(10, 5))
    ep = np.array([x[0] for x in rewards])
    rwd = np.array([np.asarray(x[1]) for x in rewards])
    if rwd.ndim == 1:
        ax.plot(ep, rwd)
        rwd = rwd.reshape(1, -1)
    else:
        mu = np.mean(rwd, axis=-1)
        std = np.std(rwd, axis=-1)
        med = np.median(rwd, axis=-1)
        ax.plot(ep, mu, linestyle="dashed", linewidth=0.3, label="mean")
        ax.plot(ep, med, linestyle="solid", linewidth=0.5, label="median")
        ax.fill_between(ep, mu - std, mu + std, alpha=0.05)
    ax.set_xlabel("epochs")
    ax.set_ylabel(f"{yaxis_label} n=({rwd.shape[-1]})")
    ax.legend(loc="upper right")
    return fig


def save_rewards_plot(rewards: List[Tuple], path: str,
                      yaxis_label: str = "total reward") -> None:
    fig = plot_rewards(rewards, yaxis_label)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    import matplotlib.pyplot as plt
    plt.close(fig)


def visualise_batch_from_experience(id: int, config, experience,
                                    out_dir: str) -> None:
    """Dump a sampled replay batch as a gif (reference
    `helpers.py:126-128`) — debugging aid for the PlaNet replay."""
    batch = experience.sample(min(config.batch_size, experience.idx - 1),
                              min(config.chunk_size, experience.idx - 1))
    obs = np.asarray(batch["obs"])           # (chunk, batch, H, W, C)
    frames = obs.reshape(-1, *obs.shape[-3:])
    if frames.dtype != np.uint8:             # dequantized [-0.5, 0.5]
        frames = np.clip((frames + 0.5) * 255.0, 0, 255)
    save_as_gif([np.asarray(f) for f in frames],
                os.path.join(out_dir, f"experience_{id}.gif"))


def visualise_trajectory(id: int, frames: Sequence[np.ndarray],
                         out_dir: str, prefix: str = "trajectory") -> None:
    """Save one rollout's frames as `<prefix>_<id>.gif` (reference
    `helpers.py:130-131`)."""
    save_as_gif([np.asarray(f) for f in frames],
                os.path.join(out_dir, f"{prefix}_{id}.gif"))

"""Matplotlib chart helpers (reference: src/utils/plot.py) — gated: metric
plotting degrades gracefully when matplotlib is absent. The visdom live
dashboard of the reference is replaced by the TSV metric streams +
the HTML report (utils/html.py); there is no visdom server in this stack."""

from __future__ import annotations

import numpy as np

from .colors import fancy_colormap  # re-export for callers


def plot_lines(df, columns, title, figsize=(10, 5.625), drop_na=True,
               colors=None, lw=2):
    """Line chart of dataframe columns -> matplotlib Figure (or None if
    matplotlib is unavailable)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    if not isinstance(columns, (list, tuple)):
        columns = [columns]
    if colors is None:
        colors = [None] * len(columns)
    fig, ax = plt.subplots(figsize=figsize)
    for col, color in zip(columns, colors):
        if col not in df.columns:
            continue
        s = df[col].dropna() if drop_na else df[col]
        ax.plot(s.index, s.values, label=col, color=color, lw=lw)
    ax.set_title(title)
    ax.legend(fontsize=8)
    fig.tight_layout()
    return fig


def plot_bar(names, values, title, figsize=(10, 5.625)):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=figsize)
    ax.bar(names, values, color=fancy_colormap(np.linspace(0, 1, len(names))))
    ax.set_title(title)
    fig.tight_layout()
    return fig

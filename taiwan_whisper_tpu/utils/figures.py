"""Paper-style figures (reference: utils/drawings/figure{1,3}.py — a
params-vs-MER scatter over model variants). matplotlib is optional."""

from __future__ import annotations

from typing import Dict, Optional, Sequence


def params_vs_mer_scatter(
    points: Sequence[Dict],
    output_path: str,
    *,
    title: str = "Model size vs MER",
    xlabel: str = "Parameters (M)",
    ylabel: str = "MER (%)",
):
    """points: [{"name", "params_m", "mer", ("group")}] -> scatter PNG/PDF."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover
        raise RuntimeError("figures require matplotlib") from e

    fig, ax = plt.subplots(figsize=(6, 4))
    groups: Dict[Optional[str], list] = {}
    for p in points:
        groups.setdefault(p.get("group"), []).append(p)
    for group, pts in groups.items():
        ax.scatter(
            [p["params_m"] for p in pts],
            [p["mer"] for p in pts],
            label=group or None, s=48,
        )
        for p in pts:
            ax.annotate(p["name"], (p["params_m"], p["mer"]),
                        textcoords="offset points", xytext=(4, 4), fontsize=8)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    if any(g for g in groups):
        ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(output_path, dpi=150)
    plt.close(fig)
    return output_path

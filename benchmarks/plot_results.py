"""Render committed benchmark JSONs to the repo's result figures.

Produces the log-log solve-time-vs-size figure (the artifact the reference
repo ships as ``results/random_qp_benchmark copy.png``) from
``results/random_qp_benchmark_tpu.json``. Styling follows the dataviz
method: two fixed categorical hues (slot 1 blue #2a78d6, slot 2 orange
#eb6834), one axis, thin 2px lines with ≥8px markers, recessive grid,
direct series labels + legend, text in neutral ink.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SERIES_1 = "#2a78d6"   # host-dispatched (includes tunnel round-trips)
SERIES_2 = "#eb6834"   # on-device loop
INK = "#33322e"
MUTED = "#8a887d"


def main(path="results/random_qp_benchmark_tpu.json",
         out="results/random_qp_benchmark_tpu.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(path) as f:
        data = json.load(f)
    recs = data["records"]
    nxs = sorted({r["nx"] for r in recs})

    host_mean, host_std, dev_us = [], [], []
    for nx in nxs:
        rs = [r for r in recs if r["nx"] == nx]
        ts = [r["solve_s"] for r in rs]
        host_mean.append(np.mean(ts))
        host_std.append(np.std(ts))
        d = [r["solve_device_us"] for r in rs if "solve_device_us" in r]
        dev_us.append(d[0] * 1e-6 if d else np.nan)

    fig, ax = plt.subplots(figsize=(7.2, 4.4), dpi=150)
    ax.errorbar(nxs, host_mean, yerr=host_std, color=SERIES_1, lw=2,
                marker="o", ms=5, capsize=3,
                label="host-dispatched (incl. remote-tunnel round-trips)")
    ax.plot(nxs, dev_us, color=SERIES_2, lw=2, marker="s", ms=5,
            label="on-device loop (cold start)")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("problem size nx  (n_eq = n_ineq = nx/4)", color=INK)
    ax.set_ylabel("solve time (s)", color=INK)
    ax.set_title("ReLU-QP (TPU-native): random-QP sweep, tol 1e-4, "
                 "5 seeds, TPU v5e", color=INK, fontsize=11)
    ax.grid(True, which="both", color=MUTED, alpha=0.18, lw=0.6)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(MUTED)
    ax.tick_params(colors=INK)
    leg = ax.legend(frameon=False, fontsize=9)
    for t in leg.get_texts():
        t.set_color(INK)
    fig.tight_layout()
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main(*sys.argv[1:])

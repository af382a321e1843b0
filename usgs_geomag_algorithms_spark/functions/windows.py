"""FIR window/coefficient generation (NumPy-only; scipy is not available).

Reproduces the coefficient vectors the reference builds with scipy at
module-import time (``geomagio/algorithm/FilterAlgorithm.py:21,33,45,57``):

- ``firwin(123, 0.25, window="blackman", fs=10.0)``  (10 Hz -> 1 s)
- ``get_window(("gaussian", 15.8734), 91)``           (1 s -> 1 min, INTERMAGNET;\n  NOTE: get_window defaults to fftbins=True -> the PERIODIC, half-sample-\n  shifted gaussian — see gaussian_periodic)
- ``boxcar(60)`` / ``boxcar(1440)``                   (min -> hour / day)

The engine normalizes every window by its sum before use (reference does the
same at ``FilterAlgorithm.py:290``), so only the *shape* must match scipy —
which these closed forms do exactly (same sinc/Blackman/Gaussian formulas).
"""

from __future__ import annotations

import json

import numpy as np


def blackman(numtaps: int) -> np.ndarray:
    """Symmetric Blackman window, a=(0.42, 0.5, 0.08) — same formula as
    numpy.blackman / scipy.signal.windows.blackman(sym=True)."""
    n = np.arange(numtaps, dtype=np.float64)
    m = numtaps - 1
    return 0.42 - 0.5 * np.cos(2 * np.pi * n / m) + 0.08 * np.cos(4 * np.pi * n / m)


def gaussian(numtaps: int, std: float) -> np.ndarray:
    """Symmetric Gaussian window exp(-n'^2 / (2 std^2)), n' centered —
    same formula as scipy.signal.windows.gaussian(sym=True)."""
    n = np.arange(numtaps, dtype=np.float64) - (numtaps - 1) / 2.0
    return np.exp(-0.5 * (n / std) ** 2)


def gaussian_periodic(numtaps: int, std: float) -> np.ndarray:
    """PERIODIC Gaussian window — what the reference actually ships for
    the INTERMAGNET minute filter: ``scipy.signal.get_window(("gaussian",
    std), Nx)`` defaults to ``fftbins=True``, which builds the symmetric
    (Nx+1)-point window and drops the last sample. The result is
    asymmetric (effective center at Nx/2, a half-INPUT-sample shift:
    w[45] == w[46] for Nx=91). Discovered against the reference's own
    ``etc/filter`` fixtures: the symmetric variant is ~0.02 nT off in
    quiet field and whole nT off during fast variations."""
    n = np.arange(numtaps + 1, dtype=np.float64) - numtaps / 2.0
    return np.exp(-0.5 * (n / std) ** 2)[:-1]


def boxcar(numtaps: int) -> np.ndarray:
    return np.ones(numtaps, dtype=np.float64)


def firwin_lowpass(numtaps: int, cutoff: float, fs: float, window: str = "blackman") -> np.ndarray:
    """Windowed-sinc lowpass FIR design, matching scipy.signal.firwin for a
    single passband [0, cutoff] with the given window and unity DC gain.

    h[n] = 2*fc * sinc(2*fc*(n - M/2)) * w[n], then scaled so sum(h) == 1
    (fc = cutoff normalized to Nyquist fs/2; scipy scales so the response at
    the passband center — DC for lowpass — is exactly 1).
    """
    if numtaps % 2 != 1:
        raise ValueError("firfilter requires an odd number of coefficients")
    fc = cutoff / (fs / 2.0)  # in Nyquist units
    m = np.arange(numtaps, dtype=np.float64) - (numtaps - 1) / 2.0
    h = fc * np.sinc(fc * m)
    if window == "blackman":
        h *= blackman(numtaps)
    elif window == "boxcar":
        pass
    else:
        raise ValueError(f"unsupported window: {window}")
    h /= h.sum()
    return h


def load_coefficients_json(path: str) -> dict:
    """Load custom filter coefficients from a JSON file of
    ``{"window": [...], "type": "firfilter"|"average"}`` — the same on-disk
    format the reference accepts (``FilterAlgorithm.load_state``,
    ``geomagio/algorithm/FilterAlgorithm.py:138-166``)."""
    with open(path) as f:
        data = json.load(f)
    return {
        "name": data.get("name", "custom"),
        "window": np.asarray(data["window"], dtype=np.float64),
        "type": data["type"],
    }


def validate_step_window(window: np.ndarray, step_type: str) -> None:
    """Firfilter steps require an odd tap count so the filter is centered
    (reference ``FilterAlgorithm._validate_step``, ``FilterAlgorithm.py:204-209``)."""
    if step_type == "firfilter" and len(window) % 2 != 1:
        raise ValueError("Firfilter requires an odd number of coefficients")

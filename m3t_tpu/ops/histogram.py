"""Color-histogram device ops (redesign of m3t/src/color_histograms.cpp).

Foreground/background RGB histograms are ``(n_bins**3,)`` float32 device arrays; color
indexing matches the reference's bitshift scheme exactly
(color_histograms.cpp:61-69: ``idx = (c0 >> s) * n^2 + (c1 >> s) * n + (c2 >> s)``),
where channel order is the OpenCV image channel order (BGR for color cameras).
Building histograms is a masked scatter-add; normalization/online adaptation follows
CalculateHistogram (color_histograms.cpp:174-215).
"""

from __future__ import annotations

import jax.numpy as jnp


def color_index(pixels, n_bins: int):
    """Flat histogram index for uint8 pixels (..., 3)."""
    bitshift = 8 - (n_bins.bit_length() - 1)  # n_bins in {2,4,8,16,32,64}
    p = jnp.asarray(pixels, jnp.int32) >> bitshift
    return p[..., 0] * n_bins * n_bins + p[..., 1] * n_bins + p[..., 2]


def add_colors(memory, pixels, mask, n_bins: int):
    """Scatter-add masked pixel colors into histogram memory (AddForegroundColor)."""
    idx = color_index(pixels, n_bins).reshape(-1)
    w = jnp.asarray(mask, jnp.float32).reshape(-1)
    return memory.at[idx].add(w)


def calculate_histogram(histogram, memory, learning_rate):
    """Reference CalculateHistogram: normalized memory blended at learning_rate.

    With sum == 0: learning_rate == 1 resets to uniform, otherwise histogram unchanged
    (color_histograms.cpp:187-195).
    """
    n = histogram.shape[0]
    total = jnp.sum(memory)
    uniform = jnp.full_like(histogram, 1.0 / n)
    safe_total = jnp.where(total > 0.0, total, 1.0)
    blended = histogram * (1.0 - learning_rate) + memory * (learning_rate / safe_total)
    zero_case = jnp.where(learning_rate == 1.0, uniform, histogram)
    return jnp.where(total > 0.0, blended, zero_case)


def lookup_probabilities(hist_f, hist_b, pixels, n_bins: int):
    """Per-pixel (p_f, p_b) normalized as in MultiplyPixelColorProbability
    (region_modality.cpp:1575-1598): normalize to p_f + p_b == 1, or 0.5/0.5 if both 0."""
    idx = color_index(pixels, n_bins)
    pf = hist_f[idx]
    pb = hist_b[idx]
    total = pf + pb
    nonzero = total > 0.0
    safe = jnp.where(nonzero, total, 1.0)
    return (
        jnp.where(nonzero, pf / safe, 0.5),
        jnp.where(nonzero, pb / safe, 0.5),
    )

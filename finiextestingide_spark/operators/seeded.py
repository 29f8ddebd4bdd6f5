"""Seeded deterministic generators for stress-test injection.

The reference pairs its seeded latency generator with a seeded probability
filter used by stress-test modules to produce reproducible trigger
sequences (seeded_probability_filter.py:16-56, consumed by
stress_test_rejection.py:22-83). Same seed + same call sequence =
identical outcomes across runs — the same parity contract as the replay
latency queue. The replay engine consumes this per scenario inside its
Arrow-batched state machine, so determinism holds per scenario-id
regardless of cluster partitioning.
"""

from __future__ import annotations

import random


class SeededProbabilityFilter:
    """Deterministic probability-based trigger (reference
    seeded_probability_filter.py:16-44): each ``should_trigger`` call at a
    probability strictly between 0 and 1 advances the seeded RNG exactly
    once; the 0.0 / 1.0 shortcuts do NOT advance it, matching the
    reference's call-sequence contract exactly."""

    def __init__(self, seed: int, probability: float):
        if not 0.0 <= probability <= 1.0:
            raise ValueError(
                f"Probability must be between 0.0 and 1.0, got {probability}"
            )
        self._rng = random.Random(seed)
        self._probability = probability

    def should_trigger(self) -> bool:
        if self._probability == 0.0:
            return False
        if self._probability == 1.0:
            return True
        return self._rng.random() < self._probability

    def get_probability(self) -> float:
        return self._probability

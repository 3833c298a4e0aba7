"""In-circuit Fiat-Shamir transcript (≙ reference std/fiat-shamir —
transcript.go:37-55: named challenges bound to all prior absorptions via a
field hasher; MiMC is the hasher here as in the reference's tests)."""

from __future__ import annotations

from .hash.mimc import MiMC


class CircuitTranscript:
    def __init__(self, api, modulus: int, challenge_names: list):
        self.api = api
        self.q = modulus
        self._names = list(challenge_names)
        self._bindings: list = []
        self._done: set = set()

    def bind(self, name: str, values):
        if name not in self._names:
            raise ValueError(f"unknown challenge {name!r}")
        if name in self._done:
            raise ValueError(f"challenge {name!r} already computed")
        self._bindings.extend(values)

    def compute_challenge(self, name: str):
        """Hash everything bound so far (+ a domain tag for the name)."""
        idx = self._names.index(name)
        for prev in self._names[:idx]:
            if prev not in self._done:
                raise ValueError(
                    f"challenge order violated: {prev!r} before {name!r}"
                )
        h = MiMC(self.api, self.q)
        tag = int.from_bytes(name.encode(), "big") % self.q
        h.write(tag, *self._bindings)
        c = h.sum()
        self._done.add(name)
        self._bindings.append(c)  # later challenges bind earlier ones
        return c

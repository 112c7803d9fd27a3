"""Unit pin for the PII-scrub synthesis arithmetic (r13): the card
numbers both engines construct must actually satisfy/violate the REAL
Luhn algorithm — validated here against an independent textbook
implementation, so the SQL arithmetic in query and oracle can't drift
into a self-consistent-but-wrong check."""

from __future__ import annotations


def reference_luhn_ok(card: str) -> bool:
    """Textbook Luhn (ISO/IEC 7812-1): double every second digit from the
    right, subtract 9 from two-digit results, valid iff sum % 10 == 0."""
    total = 0
    for r, ch in enumerate(reversed(card)):
        d = int(ch)
        if r % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def synth_cards(doc_id: int) -> tuple[str, str]:
    """The construction both the Spark query and the DuckDB oracle use."""
    b15 = "4" + str(doc_id * 37 % 100000000000000).zfill(14)
    s15 = 0
    for i in range(1, 16):  # 1-based string position; odd positions double
        d = int(b15[i - 1])
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        s15 += d
    cd = (10 - s15 % 10) % 10
    return b15 + str(cd), b15 + str((cd + 5) % 10)


class TestPiiScrubArithmetic:
    def test_valid_card_passes_reference_luhn(self):
        for doc_id in list(range(50)) + [997, 4999, 123456]:
            ok, bad = synth_cards(doc_id)
            assert len(ok) == len(bad) == 16
            assert reference_luhn_ok(ok), (doc_id, ok)
            assert not reference_luhn_ok(bad), (doc_id, bad)

    def test_known_luhn_vectors(self):
        # classic test numbers (public ISO examples)
        assert reference_luhn_ok("4539148803436467")
        assert not reference_luhn_ok("4539148803436468")

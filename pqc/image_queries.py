"""Image-table queries for the driver contract (filled by the image
island milestone — see pqc/image/ and pqc/fixtures.py)."""

from __future__ import annotations

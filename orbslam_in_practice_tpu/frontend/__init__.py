"""Perception front-end: ORB extraction, Frame, descriptor matching."""

from orbslam_in_practice_tpu.frontend.orb import ORBExtractor  # noqa: F401
from orbslam_in_practice_tpu.frontend.frame import Frame  # noqa: F401

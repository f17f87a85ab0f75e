"""Classifier tests ported from internal/classify/classify_test.go."""

import pytest

from sift_ray.textproc.classify import Classifier


@pytest.fixture(scope="module")
def clf():
    return Classifier()


# classify_test.go:16-110
@pytest.mark.parametrize("text,idx,total,expected", [
    ("", 0, 1, True),
    ("   \n\t  ", 0, 1, True),
    ("Copyright 2026. All rights reserved. This text may not be reproduced "
     "without permission.", 9, 10, True),
    ("Home About Profile Share Content Navigation Footer", 0, 10, True),
    ("The carrot cake recipe requires sifting flour through a fine mesh sieve "
     "to achieve the perfect texture. This traditional baking technique "
     "removes lumps and aerates the flour, ensuring a light and fluffy cake.",
     5, 10, False),
    ("The baker carefully sifted confectioner sugar for the icing. The page "
     "contained detailed instructions for this important step in carrot cake "
     "preparation.", 3, 8, False),
    ("ISBN 479-04550 Published by Publications Department of Federal "
     "Publishing Standards", 0, 5, True),
    ("This is the complete content of a very short document about sifting "
     "flour for baking.", 0, 1, False),
    ("Appendix A: Figure 1 References: Lorem Ipsum Foundation Publications, "
     "2023.", 7, 8, True),
])
def test_is_extraneous(clf, text, idx, total, expected):
    assert clf.is_extraneous(text, idx, total) is expected


def test_position_sensitivity(clf):
    # classify_test.go:112-166 — same text extraneous at edges, kept in middle
    text = ("Hello there! This is some valid text that contains a bit of "
            "publishing terminology copyright 2025")
    assert clf.is_extraneous(text, 0, 10) is True
    assert clf.is_extraneous(text, 9, 10) is True
    assert clf.is_extraneous(text, 5, 10) is False


# classify_test.go:168-223
@pytest.mark.parametrize("text,idx,total,expected", [
    ("some text", 0, 0, False),
    ("some text", -1, 5, False),
    ("some text", 10, 5, False),
    ("Lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
     "tempor incididunt ut labore et dolore magna aliqua ut enim ad minim "
     "veniam quis nostrud exercitation ullamco laboris nisi ut aliquip ex ea "
     "commodo consequat duis aute irure dolor in reprehenderit in voluptate "
     "velit esse cillum dolore eu fugiat nulla pariatur", 2, 5, False),
])
def test_edge_cases(clf, text, idx, total, expected):
    assert clf.is_extraneous(text, idx, total) is expected


def test_threshold_curve():
    # classify.go:139-166
    t = Classifier.calculate_threshold
    assert t(0, 0) == 0.33
    assert t(-1, 5) == 0.33
    assert t(5, 5) == 0.33
    assert t(0, 3) == 0.5
    assert t(0, 10) == pytest.approx(0.1)
    assert t(9, 10) == pytest.approx(0.1)
    mid = t(5, 10)
    assert 0.25 < mid <= 0.33

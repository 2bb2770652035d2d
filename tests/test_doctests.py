"""Doctest runner for the documented public functions (reference test style:
NumPy docstring examples throughout, SURVEY.md §5)."""

import doctest

import parquet_converter_ray.codecs as codecs_mod
import parquet_converter_ray.codecs.fsst as fsst_mod
import parquet_converter_ray.codecs.util as util_mod


def test_doctests():
    for mod in (util_mod, codecs_mod, fsst_mod):
        result = doctest.testmod(mod, verbose=False)
        assert result.failed == 0, f"{mod.__name__}: {result.failed} doctest failures"
        assert result.attempted > 0 or mod is codecs_mod

"""Doctest runner for the documented public functions (reference test style:
NumPy docstring examples throughout, SURVEY.md §5)."""

import doctest

import parquet_converter_ray.codecs as codecs_mod
import parquet_converter_ray.codecs.fsst as fsst_mod
import parquet_converter_ray.codecs.util as util_mod
import parquet_converter_ray.convert as convert_mod
import parquet_converter_ray.logging_setup as logging_mod
import parquet_converter_ray.profile as profile_mod


def test_doctests():
    for mod in (util_mod, codecs_mod, fsst_mod, convert_mod, logging_mod, profile_mod):
        result = doctest.testmod(mod, verbose=False)
        assert result.failed == 0, f"{mod.__name__}: {result.failed} doctest failures"

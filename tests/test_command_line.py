"""Command-line parser behavior matrix (reference:
test/test_command_line_parser.c:24-599)."""

import io

import pytest

from sla_tpu.command_line import (
    OptionSpec,
    ParserResult,
    get_argument_string,
    get_option_acquired,
    parse_arguments,
)


def make_specs():
    return [
        OptionSpec("a", "aaa", False, "flag a"),
        OptionSpec("b", "bbb", False, "flag b"),
        OptionSpec("c", "ccc", True, "option c"),
        OptionSpec("d", "ddd", True, "option d"),
    ]


def parse(args, npos=4):
    specs = make_specs()
    pos = [None] * npos
    res = parse_arguments(specs, ["prog"] + args, pos, err=io.StringIO())
    return res, specs, pos


def test_short_options():
    res, specs, _ = parse(["-a", "-b"])
    assert res == ParserResult.OK
    assert get_option_acquired(specs, "a") and get_option_acquired(specs, "b")
    assert not get_option_acquired(specs, "c")


def test_short_option_run():
    res, specs, _ = parse(["-ab"])
    assert res == ParserResult.OK
    assert get_option_acquired(specs, "a") and get_option_acquired(specs, "b")


def test_short_with_argument():
    res, specs, _ = parse(["-c", "val"])
    assert res == ParserResult.OK
    assert get_argument_string(specs, "c") == "val"


def test_short_run_arg_must_be_tail():
    res, _, _ = parse(["-ca", "val"])
    assert res == ParserResult.INVALID_SHORT_OPTION_ARGUMENT
    res, specs, _ = parse(["-ac", "val"])
    assert res == ParserResult.OK
    assert get_argument_string(specs, "c") == "val"


def test_long_options():
    res, specs, _ = parse(["--aaa", "--ccc", "v"])
    assert res == ParserResult.OK
    assert get_option_acquired(specs, "aaa")
    assert get_argument_string(specs, "ccc") == "v"


def test_long_equals_argument():
    res, specs, _ = parse(["--ccc=value"])
    assert res == ParserResult.OK
    assert get_argument_string(specs, "ccc") == "value"
    assert get_argument_string(specs, "c") == "value"  # short alias lookup


def test_unknown_options():
    assert parse(["-x"])[0] == ParserResult.UNKNOWN_OPTION
    assert parse(["--zzz"])[0] == ParserResult.UNKNOWN_OPTION


def test_duplicate_options():
    assert parse(["-a", "-a"])[0] == ParserResult.OPTION_MULTIPLY_SPECIFIED
    assert parse(["--aaa", "-a"])[0] == ParserResult.OPTION_MULTIPLY_SPECIFIED
    assert parse(["-c", "x", "--ccc", "y"])[0] == ParserResult.OPTION_MULTIPLY_SPECIFIED


def test_missing_argument():
    assert parse(["-c"])[0] == ParserResult.NOT_SPECIFY_ARGUMENT_TO_OPTION
    assert parse(["--ccc"])[0] == ParserResult.NOT_SPECIFY_ARGUMENT_TO_OPTION
    # option argument may not begin with '-'
    assert parse(["-c", "-a"])[0] == ParserResult.NOT_SPECIFY_ARGUMENT_TO_OPTION
    assert parse(["--ccc", "--aaa"])[0] == ParserResult.NOT_SPECIFY_ARGUMENT_TO_OPTION


def test_positional_capture():
    res, specs, pos = parse(["in.wav", "-a", "out.sla"])
    assert res == ParserResult.OK
    assert pos[0] == "in.wav" and pos[1] == "out.sla"


def test_positional_overflow():
    res, _, _ = parse(["a", "b"], npos=1)
    assert res == ParserResult.INSUFFICIENT_OTHER_STRING_ARRAY_SIZE


def test_invalid_specification_duplicate_short():
    specs = [OptionSpec("a", "aaa", False, ""), OptionSpec("a", "bbb", False, "")]
    res = parse_arguments(specs, ["prog", "-a"], [None], err=io.StringIO())
    assert res == ParserResult.INVALID_SPECIFICATION


def test_bare_dash_consumed_like_reference():
    """A bare "-" is an empty short-option run the reference parser
    silently consumes (its character loop runs zero times) — it must not
    become a positional argument."""
    specs = [OptionSpec("e", "encode", False, "")]
    positional = [None, None]
    res = parse_arguments(specs, ["prog", "-e", "-", "in.wav", "out.sla"],
                          positional)
    assert res == ParserResult.OK
    assert positional == ["in.wav", "out.sla"]

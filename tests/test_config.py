"""Settings CLI parser (reference src/Solver.cpp:273-307 contract)."""

import pytest

from admm_elastic_tpu.config import Settings


def test_parse_args_flags():
    s = Settings()
    assert not s.parse_args(["-dt", "0.01", "-v", "2", "-it", "7",
                             "-g", "-1.5", "-ls", "4", "-ck", "3.0"])
    assert s.timestep_s == 0.01
    assert s.verbose == 2
    assert s.admm_iters == 7
    assert s.gravity == -1.5
    assert s.linsolver == 4
    assert s.constraint_w == 3.0


def test_parse_args_help_returns_true(capsys):
    assert Settings().parse_args(["-help"])
    assert "-ls" in capsys.readouterr().out


def test_parse_args_trailing_flag_errors():
    """A flag with no value must raise, not be silently ignored
    (round-1 ADVICE: `-it` at argv end was swallowed)."""
    with pytest.raises(ValueError, match="-it"):
        Settings().parse_args(["-dt", "0.01", "-it"])


def test_parse_args_ignores_unknown():
    s = Settings()
    assert not s.parse_args(["--frames", "5", "-it", "3"])
    assert s.admm_iters == 3

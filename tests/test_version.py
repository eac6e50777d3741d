"""Version consistency between the python package and the compiled
native runtime (reference tests/test_version.py: the C++-compiled
version string must match versioneer's python version)."""

import khmer_tpu as khmer


def test_python_and_c_match():
    """The native runtime's compiled-in stamp equals the package
    version (reference test_version.py::test_python_and_c_match)."""
    assert khmer.__version_cpp__() == khmer.__version__


def test_python_and_c_match_base():
    """Same with any local-build suffix stripped
    (reference test_version.py::test_python_and_c_match_base)."""
    cppver = "-".join(khmer.__version_cpp__().split("-")[0:2])
    pyver = "-".join(khmer.__version__.split("-")[0:2])
    assert cppver == pyver


def test_version_is_nonempty_pep440ish():
    v = khmer.__version__
    assert v and v[0].isdigit() and "." in v

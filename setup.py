"""Build hooks: compile the native IO/repack engine into the wheel.

`native/drs_io.cpp` is a dependency-free C++ library loaded via ctypes
(diffusion_rs_tpu/io/native.py) — it is NOT a CPython extension module, so
we build it as a plain shared object and place it inside the package as
package data (`diffusion_rs_tpu/_native/libdrs_io.so`). The extension is
OPTIONAL: if no C++ toolchain is present the wheel still builds and the
runtime falls back to the in-tree `make` build or pure numpy
(io/native.py get_lib()).

Reference context: the reference ships its native load path inside the
compiled crate itself (diffusion_rs_common — mmap + loader threads +
SIMD repack) and builds manylinux wheels via Dockerfile.manylinux:1-8.
"""

from __future__ import annotations

import logging
import subprocess
import sysconfig
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

log = logging.getLogger(__name__)
ROOT = Path(__file__).resolve().parent


class BuildPyWithNative(build_py):
    """build_py that also compiles native/drs_io.cpp into the package."""

    def run(self):
        super().run()
        self._build_native()

    def _build_native(self):
        src = ROOT / "native" / "drs_io.cpp"
        if not src.exists():  # sdist without native sources
            return
        outdir = Path(self.build_lib) / "diffusion_rs_tpu" / "_native"
        outdir.mkdir(parents=True, exist_ok=True)
        out = outdir / "libdrs_io.so"
        cxx = sysconfig.get_config_var("CXX") or "g++"
        cmd = [
            *cxx.split(),
            "-O3", "-fPIC", "-std=c++17", "-pthread", "-shared",
            # no -march=native in wheels: keep the binary portable
            "-o", str(out), str(src),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            print(f"built native engine: {out}")
        except Exception as e:  # optional — runtime has numpy fallbacks
            log.warning("native build skipped (%s); wheel works without it", e)


cmdclass = {"build_py": BuildPyWithNative}
try:
    from wheel.bdist_wheel import bdist_wheel

    class BdistWheelPlatform(bdist_wheel):
        """Tag the wheel platform-specific (it carries libdrs_io.so) but
        python-version-independent (the lib is bound via ctypes, no CPython
        ABI)."""

        def finalize_options(self):
            super().finalize_options()
            self.root_is_pure = False

        def get_tag(self):
            _, _, plat = super().get_tag()
            return "py3", "none", plat

    cmdclass["bdist_wheel"] = BdistWheelPlatform
except ImportError:  # pragma: no cover — wheel not installed (sdist-only)
    pass

setup(cmdclass=cmdclass)


"""Offline data-generation chain (the reference's 4-stage pipeline,
SURVEY.md §3.4) rebuilt TPU/JAX-native:

* ``microphysics``  — cloud microphysics → optical extinction β
                      (stage A physics, reference mitsuba3/calc_beta.py).
* ``lespatch``      — BOMEX LES netCDF → 128³ volume patches (stage A,
                      reference preprocessing/preprocessing.py; h5py-based —
                      netCDF4 is not in this image).
* ``raycast``       — first-hit + z-slice velocity-map ray casting as
                      jit/vmapped JAX (stage C, reference
                      preprocessing/build_W_map.py) — runs ON TPU.
* ``velocity_maps`` — batch driver over patch folders (stage C driver,
                      reference preprocessing/build_WVU_maps.py).
* ``renderer``      — JAX volumetric radiance renderer (single+multi-scatter
                      HG, directional sun; shear-warp camera composite for
                      near-parallel satellite views) replacing the Mitsuba
                      dependency for stage B; VOL interop for exact-Mitsuba
                      workflows.
* ``render_shard``  — batched stage-B rendering with the patch axis sharded
                      over a jax.sharding.Mesh (data-parallel datagen).
* ``mc_reference``  — Monte-Carlo volumetric path tracer (delta tracking +
                      HG sampling + sun NEE): the unbiased oracle bounding
                      the deterministic renderer's domain gap (the
                      reference's volpath analog, render.py:215-218); also
                      a production stage-B option via
                      ``render_dataset(mc_spp=N)`` / ``gen-renders
                      --mc-spp N`` (reference runs volpath spp 8192,
                      render_all.py:28-30).
* ``vol_format``    — Mitsuba ``VOL`` v3 binary grid writer/reader
                      (interop with reference-rendered assets).
* ``overpass``      — satellite overpass CSV parsing + ENU camera setups
                      (reference render.py:64-83 / build_WVU_maps.py:11-47).
* ``sequences``     — renders+maps → training npz assembly (stage D,
                      reference preprocessing/build_sequences.py,
                      build_clouds_data_set.py).
* ``alignment``     — multi-view homography alignment to a virtual camera
                      (reference mitsuba3/image_alignment_utils.py) in JAX.
"""

from .microphysics import process_cloud_vars  # noqa: F401
from .raycast import VolumeGrid, make_rays, first_hit_maps, z_slice_maps  # noqa: F401
from .vol_format import write_vol, read_vol  # noqa: F401
from .overpass import read_overpass_csv, OverpassView  # noqa: F401

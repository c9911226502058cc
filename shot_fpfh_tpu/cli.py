"""Command-line entry point: register two .ply point clouds.

TPU rewrite of the reference driver (scripts/register_point_clouds.py:25-158 +
scripts/parse_args.py): load clouds → normals → keypoints → descriptors →
matching → RANSAC → ICP → metrics → write aligned outputs, with per-stage
timings and optional ground-truth accounting from a Stanford ``.conf`` file.
"""

from __future__ import annotations

import argparse
import functools
import hashlib
import json
import logging
import os
from pathlib import Path


from .configuration import load_config_from_yaml
from .io.ground_truth import get_transform_from_conf_file
from .io.ply import get_data
from .models.normals import compute_normals
from .pipeline import RegistrationPipeline
from .utils.perf import checkpoint

logger = logging.getLogger(__name__)

_DEFAULT_CONFIG = str(Path(__file__).resolve().parent.parent / "config" / "default.yaml")


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog="register_point_clouds",
        description="TPU-native SHOT/FPFH point-cloud registration",
    )
    io_group = parser.add_argument_group("I/O")
    io_group.add_argument("--scan_file_path", "-s", type=str,
                          default="./data/bunny/bun045.ply")
    io_group.add_argument("--ref_file_path", "-r", type=str,
                          default="./data/bunny/bun000.ply")
    io_group.add_argument("--conf_file_path", "-c", type=str,
                          default="./data/bunny/bun.conf",
                          help="Stanford .conf ground truth (optional)")
    io_group.add_argument("--config", type=str, default=_DEFAULT_CONFIG)
    io_group.add_argument("--output_dir", type=str, default="./data/results")
    io_group.add_argument("--disable_ply_writing", action="store_true")
    io_group.add_argument("--metrics_json", type=str, default=None,
                          help="Write per-stage metrics to this JSON file")

    kp = parser.add_argument_group("keypoint selection")
    kp.add_argument("--selection_algorithm", type=str, default=None,
                    choices=["random", "iterative", "subsampling", "subsampling_with_density"])
    kp.add_argument("--neighborhood_size", type=float, default=None)
    kp.add_argument("--min_n_neighbors", type=int, default=None)

    desc = parser.add_argument_group("descriptors")
    desc.add_argument("--descriptor_choice", type=str, default=None,
                      choices=["fpfh", "shot_single_scale", "shot_bi_scale", "shot_multiscale"])
    desc.add_argument("--radius", type=float, default=None)
    desc.add_argument("--fpfh_n_bins", type=int, default=None)
    desc.add_argument("--phi", type=float, default=None)
    desc.add_argument("--rho", type=float, default=None)
    desc.add_argument("--n_scales", type=int, default=None)
    desc.add_argument("--min_neighborhood_size", type=int, default=None)

    match = parser.add_argument_group("matching and RANSAC")
    match.add_argument("--matching_algorithm", type=str, default=None,
                       choices=["simple", "double", "ratio", "threshold"])
    match.add_argument("--reject_threshold", type=float, default=None)
    match.add_argument("--threshold_multiplier", type=float, default=None)
    match.add_argument("--n_draws", type=int, default=None)
    match.add_argument("--draw_size", type=int, default=None)
    match.add_argument("--max_inliers_distance", type=float, default=None)
    match.add_argument("--seed", type=int, default=None)

    icp = parser.add_argument_group("ICP")
    icp.add_argument("--icp_type", type=str, default=None,
                     choices=["point_to_point", "point_to_plane"])
    icp.add_argument("--d_max", type=float, default=None)
    icp.add_argument("--voxel_size", type=float, default=None)
    icp.add_argument("--max_iter", type=int, default=None)
    icp.add_argument("--rms_threshold", type=float, default=None)

    compute = parser.add_argument_group("compute")
    compute.add_argument("--k_max_descriptor", type=int, default=None)
    compute.add_argument("--k_max_fpfh", type=int, default=None)
    compute.add_argument("--normals_k", "--normals_computation_k", type=int,
                         default=None, dest="normals_k",
                         help="Number of neighbors used to compute normals "
                              "(reference name: --normals_computation_k).")
    compute.add_argument("--share_local_rfs",
                         action=argparse.BooleanOptionalAction, default=None,
                         help="Share local reference frames between SHOT "
                              "scales (reference parse_args.py:87-90; the "
                              "config default is True, so --no-share_local_rfs "
                              "is the meaningful override).")
    compute.add_argument("--disable_progress_bars", action="store_true",
                         help="Reference-compatibility no-op: stages here are "
                              "single device programs with no inner loops to "
                              "report on (reference parse_args.py:35-38).")
    compute.add_argument("--state_cache", type=str, default=None,
                         help="npz path: save/resume keypoints+descriptors+matches")
    compute.add_argument("--fused", action="store_const", const=True, default=None,
                         help="Run keypoints+SHOT+matching+RANSAC+ICP as ONE "
                              "XLA program (zero host round-trips). Requires "
                              "subsampling keypoints, SHOT/FPFH descriptors "
                              "and simple/ratio/double matching; falls back "
                              "to the staged pipeline (with a warning) "
                              "otherwise. Composes with --n_devices: the "
                              "program shards over the mesh.")
    compute.add_argument("--debug_nans", action="store_const", const=True, default=None)
    compute.add_argument("--debug_shot", action="store_const", const=True, default=None,
                         help="Validate SHOT bin indices and quadrilinear "
                              "weight sums on device (counterpart of the "
                              "reference's sequential-SHOT debug_mode "
                              "asserts).")
    compute.add_argument("--n_devices", type=int, default=None,
                         help="Devices in the 1-D mesh the pipeline shards "
                              "over (0 = all visible devices, 1 = single-"
                              "device; the TPU counterpart of the reference's "
                              "--n_procs).")
    compute.add_argument("--n_procs", type=int, default=None, dest="n_devices",
                         help="Reference-compatibility alias for --n_devices.")
    compute.add_argument("--mesh_axis", type=str, default=None,
                         help="Name of the mesh axis. Must be 'points' — "
                              "every sharded stage binds that name; any other "
                              "value is rejected at mesh construction.")

    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    config = load_config_from_yaml(args.config, vars(args))
    timer = checkpoint()

    compute_cfg = config["compute"]
    if compute_cfg.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    if compute_cfg.debug_shot:
        from .models.shot import enable_debug_checks

        enable_debug_checks(True)

    # persistent XLA compile cache: repeat CLI runs on similar cloud pairs
    # skip the (tunnel-dominated) compile cost entirely
    from .utils.perf import enable_compilation_cache

    enable_compilation_cache()

    # Build the device mesh the pipeline shards over (n_devices=0 means all
    # visible devices; a 1-device mesh degenerates to the single-chip path).
    mesh = None
    if compute_cfg.n_devices != 1:
        from .parallel import make_mesh

        mesh = make_mesh(compute_cfg.n_devices, axis=compute_cfg.mesh_axis)
        if mesh.devices.size <= 1:
            mesh = None
        else:
            logger.info(
                "Sharding pipeline stages over a %d-device mesh (axis %r).",
                mesh.devices.size, compute_cfg.mesh_axis,
            )

    normals_callback = functools.partial(compute_normals, mesh=mesh)
    scan, scan_normals = get_data(
        args.scan_file_path, k=compute_cfg.normals_k,
        normals_computation_callback=normals_callback,
    )
    ref, ref_normals = get_data(
        args.ref_file_path, k=compute_cfg.normals_k,
        normals_computation_callback=normals_callback,
    )
    timer("Data loading + normals")

    exact_transform = None
    if args.conf_file_path and os.path.exists(args.conf_file_path):
        try:
            exact_transform = get_transform_from_conf_file(
                args.conf_file_path, args.scan_file_path, args.ref_file_path
            )
        except (KeyError, ValueError) as exc:
            logger.warning("Could not recover ground truth: %s", exc)

    pipeline = RegistrationPipeline(
        scan=scan, scan_normals=scan_normals, ref=ref, ref_normals=ref_normals,
        k_max_descriptor=compute_cfg.k_max_descriptor,
        k_max_fpfh=compute_cfg.k_max_fpfh,
        mesh=mesh,
    )

    kp_cfg = config["keypoint_selection"]
    desc_cfg = config["descriptor"]
    match_cfg = config["matching"]
    ransac_cfg = config["ransac"]
    icp_cfg = config["icp"]

    use_fused = False
    if compute_cfg.fused:
        # the fused program covers subsampling keypoints + every reference
        # descriptor config (single/bi/multi-scale SHOT, FPFH) with
        # nearest/ratio matching (multiscale: scales concatenate, the
        # reference workflow's layout, so every matching mode applies)
        # on a single chip; anything else stages
        # accept both multiscale spellings, like the staged dispatcher
        # (reference dispatch-mismatch fix, SURVEY §2.4.4)
        is_multiscale = desc_cfg.descriptor_choice in (
            "shot_multiscale", "shot_multi_scale"
        )
        if kp_cfg.selection_algorithm != "subsampling" or not kp_cfg.neighborhood_size:
            reason = "keypoint selection must be 'subsampling' with a neighborhood_size"
        elif desc_cfg.descriptor_choice not in (
            "shot_single_scale", "shot_bi_scale", "shot_multiscale",
            "shot_multi_scale", "fpfh"
        ):
            reason = "descriptor must be shot_single_scale/shot_bi_scale/shot_multiscale/fpfh"
        elif match_cfg.matching_algorithm not in ("simple", "ratio", "double"):
            reason = "matching must be simple/ratio/double"
        elif is_multiscale and not desc_cfg.share_local_rfs:
            reason = ("the fused multiscale leg always shares first-scale "
                      "local frames; drop --no-share_local_rfs")
        elif compute_cfg.state_cache:
            reason = "the fused program has no resumable intermediate state"
        else:
            reason, use_fused = None, True
        if reason:
            logger.warning("--fused requested but staging instead: %s", reason)

    if use_fused:
        logger.info("Fused single-program registration (radius=%s).", desc_cfg.radius)
        ratio = (match_cfg.reject_threshold
                 if match_cfg.matching_algorithm in ("ratio", "double") else 1.0)
        res = pipeline.run_fused(
            keypoint_voxel=kp_cfg.neighborhood_size,
            icp_voxel=icp_cfg.voxel_size,
            radius=desc_cfg.radius,
            descriptor_choice=desc_cfg.descriptor_choice,
            phi=desc_cfg.phi,
            n_scales=desc_cfg.n_scales,
            fpfh_n_bins=desc_cfg.fpfh_n_bins,
            ratio_threshold=ratio,
            ransac_threshold=ransac_cfg.max_inliers_distance,
            d_max=icp_cfg.d_max,
            rms_threshold=icp_cfg.rms_threshold,
            min_neighborhood_size=desc_cfg.min_neighborhood_size,
            n_draws=ransac_cfg.n_draws,
            draw_size=ransac_cfg.draw_size,
            max_iter=icp_cfg.max_iter,
            point_to_plane=icp_cfg.icp_type == "point_to_plane",
            seed=ransac_cfg.seed,
        )
        transform_ransac = res.ransac_transform
        inlier_ratio = float(res.ransac_inlier_ratio)
        transform_icp = res.icp_transform
        rms = float(res.icp_rms)
        converged = bool(res.icp_converged)
        logger.info(
            "Fused: %d matches, RANSAC inlier ratio %.3f",
            int(res.n_matches), inlier_ratio,
        )
        logger.info("RANSAC transform:\n%r", transform_ransac)
        logger.info("ICP RMS: %.4f (converged: %s)", rms, converged)
        logger.info("ICP transform:\n%r", transform_icp)
        timer("Fused registration")
    else:
        # cache key: every section that determines the cached state (keypoints,
        # descriptors, AND matches — the cache stores matches and the pipeline
        # early-returns on them) — a cache written under a different config must
        # not be resumed.  The INPUT CLOUDS are part of the key too (path +
        # size + mtime): reusing one --state_cache file across different cloud
        # pairs must not silently resume the wrong pair's keypoints (ADVICE r2 #3).
        def _file_id(path: str):
            try:
                st = os.stat(path)
                return [path, st.st_size, st.st_mtime_ns]
            except OSError:
                return [path, -1, -1]

        state_key = hashlib.sha256(json.dumps(
            {"kp": repr(config["keypoint_selection"]),
             "desc": repr(config["descriptor"]),
             "match": repr(config["matching"]),
             "caps": [compute_cfg.k_max_descriptor, compute_cfg.k_max_fpfh,
                      compute_cfg.normals_k],
             "inputs": [_file_id(args.scan_file_path),
                        _file_id(args.ref_file_path)]},
            sort_keys=True,
        ).encode()).hexdigest()
        state_resumed = False
        if compute_cfg.state_cache and os.path.exists(compute_cfg.state_cache):
            logger.info("Resuming intermediate state from %s", compute_cfg.state_cache)
            state_resumed = pipeline.load_state(
                compute_cfg.state_cache, config_key=state_key
            )

        logger.info(kp_cfg.help_message())
        pipeline.select_keypoints(
            kp_cfg.selection_algorithm,
            neighborhood_size=kp_cfg.neighborhood_size,
            min_n_neighbors=kp_cfg.min_n_neighbors,
        )
        timer("Keypoint selection")

        logger.info(desc_cfg.help_message())
        pipeline.compute_descriptors(
            radius=desc_cfg.radius,
            descriptor_choice=desc_cfg.descriptor_choice,
            fpfh_n_bins=desc_cfg.fpfh_n_bins,
            phi=desc_cfg.phi,
            rho=desc_cfg.rho,
            n_scales=desc_cfg.n_scales,
            subsample_support=desc_cfg.subsample_support,
            normalize=desc_cfg.normalize,
            share_local_rfs=desc_cfg.share_local_rfs,
            min_neighborhood_size=desc_cfg.min_neighborhood_size,
        )
        timer("Descriptors")

        if compute_cfg.state_cache and not state_resumed:
            # also OVERWRITES a cache that was refused for a config mismatch —
            # otherwise the stale file would disable checkpoint/resume forever
            pipeline.save_state(compute_cfg.state_cache, config_key=state_key)
            logger.info("Saved intermediate state to %s", compute_cfg.state_cache)

        logger.info(match_cfg.help_message())
        pipeline.find_descriptors_matches(
            match_cfg.matching_algorithm,
            reject_threshold=match_cfg.reject_threshold,
            threshold_multiplier=match_cfg.threshold_multiplier,
        )
        timer("Matching")
        if exact_transform is not None:
            pipeline.analyze_matches(match_cfg.matching_algorithm, exact_transform)

        logger.info(ransac_cfg.help_message())
        transform_ransac, inlier_ratio = pipeline.run_ransac(
            n_draws=ransac_cfg.n_draws,
            draw_size=ransac_cfg.draw_size,
            max_inliers_distance=ransac_cfg.max_inliers_distance,
            seed=ransac_cfg.seed,
            exact_transformation=exact_transform,
        )
        logger.info("RANSAC inlier ratio: %.3f", inlier_ratio)
        logger.info("RANSAC transform:\n%r", transform_ransac)
        timer("RANSAC")

        logger.info(icp_cfg.help_message())
        transform_icp, rms, converged = pipeline.run_icp(
            icp_cfg.icp_type,
            transformation_init=transform_ransac,
            d_max=icp_cfg.d_max,
            voxel_size=icp_cfg.voxel_size,
            max_iter=icp_cfg.max_iter,
            rms_threshold=icp_cfg.rms_threshold,
        )
        logger.info("ICP RMS: %.4f (converged: %s)", rms, converged)
        logger.info("ICP transform:\n%r", transform_icp)
        timer("ICP")

    eval_cfg = config["registration_evaluation"]
    overlap, kp_inliers = pipeline.compute_metrics_post_icp(
        transform_icp, eval_cfg.distance_to_map_threshold
    )
    accepted = eval_cfg.eval_registration(
        overlap=overlap, distance_to_map=rms, inliers=kp_inliers
    )
    logger.info(
        "Overlap: %.1f%% | keypoint inliers: %.1f%% | registration %s",
        overlap * 100, kp_inliers * 100, "ACCEPTED" if accepted else "REJECTED",
    )
    timer("Metrics")

    if not args.disable_ply_writing:
        os.makedirs(args.output_dir, exist_ok=True)
        scan_name = Path(args.scan_file_path).stem
        ref_name = Path(args.ref_file_path).stem
        pipeline.write_alignments(
            (f"{args.output_dir}/{scan_name}_on_{ref_name}_post_ransac.ply", transform_ransac),
            (f"{args.output_dir}/{scan_name}_on_{ref_name}_post_icp.ply", transform_icp),
        )
        timer("Writing outputs")

    if args.metrics_json:
        with open(args.metrics_json, "w") as f:
            json.dump(pipeline.metrics.summary(), f, indent=2)

    return 0 if accepted else 1


if __name__ == "__main__":
    raise SystemExit(main())

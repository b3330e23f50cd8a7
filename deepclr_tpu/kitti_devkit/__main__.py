"""CLI: python -m deepclr_tpu.kitti_devkit GT_DIR PRED_DIR [RESULT_DIR]."""
import argparse

from . import eval as kitti_eval


def main():
    parser = argparse.ArgumentParser(
        description="KITTI odometry benchmark evaluation."
    )
    parser.add_argument("gt_dir", type=str, help="ground-truth pose directory")
    parser.add_argument("pred_dir", type=str, help="predicted pose directory")
    parser.add_argument("result_dir", type=str, nargs="?", default=None,
                        help="output directory (default: PRED_DIR/result)")
    parser.add_argument("--no-plots", action="store_true",
                        help="skip path/error plot generation")
    args = parser.parse_args()

    n = kitti_eval(args.gt_dir, args.pred_dir, args.result_dir)
    if not args.no_plots and n > 0:
        from .plots import write_plots

        write_plots(args.gt_dir, args.pred_dir, args.result_dir)
    print(f"evaluated {n} sequences")


if __name__ == "__main__":
    main()

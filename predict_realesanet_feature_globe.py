"""CLI twin of the reference's 301-urban-center predictor
(predict_realesanet_feature_globe.py:221-233)."""
import os
import sys

from srbh_tpu.train.checkpoint import load_checkpoint, restore_into_state
from srbh_tpu.train.config import get_args
from srbh_tpu.train.state import TrainState
from srbh_tpu.train.trainer import build_models, init_models, load_sr_params
from srbh_tpu.predict.predictor import city_names_from_dir, predict_cities

if __name__ == "__main__":
    args = get_args(city="globe", argv=sys.argv[1:])
    args.checkpoint = "checkpoint20"

    model, sr = build_models(args)
    variables, sr_params = init_models(args, model, sr)
    if os.environ.get("SRBH_PACKED", "") == "1":
        # space-to-depth compute mode (ops/s2d.py): same checkpoint layout
        # and outputs; measured slower than literal on the current XLA stack
        # (2x2 conv emitter runs at half the lane-bound rate) — opt-in hook.
        model = model.clone(compute_mode="packed")
    sr_params, _ = load_sr_params(args, sr_params)
    payload = load_checkpoint(os.path.join(args.logdir, args.checkpoint))
    if payload is None:
        sys.exit(f"no checkpoint at {args.logdir}/{args.checkpoint}")
    state = restore_into_state(
        TrainState.create(variables, n_log_vars=3, lr=args.lr), payload)
    model_vars = {"params": state.params, "batch_stats": state.batch_stats}

    for isoname in ("chn_large", "usa_large", "europe_large",
                    "chn_metro", "usa_metro", "europe_metro"):
        wholeimgpath = os.path.join(args.datapath, "urban", "input_data",
                                    "s2" + isoname)
        if not os.path.isdir(wholeimgpath):
            continue
        cities = city_names_from_dir(wholeimgpath)
        respath = os.path.join(args.logdir, f"pred_{payload['epoch']}_city{isoname}")
        os.makedirs(respath, exist_ok=True)
        predict_cities(wholeimgpath, cities, model, sr, model_vars, sr_params,
                       args.datastats, respath, s1dir=args.s1dir,
                       s2dir=args.s2dir, gridvalid="isv",
                       nchans=args.nchanss2, chans_build=args.chans_build,
                       batch_size=16)

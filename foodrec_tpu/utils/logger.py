# coding: utf-8
"""Stream + file logger with the reference's line shapes
(FoodRec/utils/logger.py:9-59)."""

import logging
import os

from foodrec_tpu.utils.misc import get_local_time

_LEVELS = {
    "info": logging.INFO,
    "debug": logging.DEBUG,
    "error": logging.ERROR,
    "warning": logging.WARNING,
    "critical": logging.CRITICAL,
}


def init_logger(config):
    log_root = config["log_root"] or "./log/"
    os.makedirs(log_root, exist_ok=True)

    logfilename = "{}-{}-{}.log".format(
        config["model"], config["dataset"], get_local_time()
    )
    logfilepath = os.path.join(log_root, logfilename)

    state = (config["state"] or "info").lower()
    level = _LEVELS.get(state, logging.INFO)

    fileformatter = logging.Formatter(
        "%(asctime)-15s %(levelname)s %(message)s", "%a %d %b %Y %H:%M:%S"
    )
    sformatter = logging.Formatter(
        "%(asctime)-15s %(levelname)s %(message)s", "%d %b %H:%M"
    )

    fh = logging.FileHandler(logfilepath, "w", "utf-8")
    fh.setLevel(level)
    fh.setFormatter(fileformatter)

    sh = logging.StreamHandler()
    sh.setLevel(level)
    sh.setFormatter(sformatter)

    root = logging.getLogger()
    root.setLevel(level)
    # re-init safe: clear handlers installed by a previous experiment
    root.handlers.clear()
    root.addHandler(sh)
    root.addHandler(fh)

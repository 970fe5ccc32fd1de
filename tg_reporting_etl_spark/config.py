"""Engine configuration — reference parameter parity.

Values mirror /root/reference/task-executor/report_config.py so derived
flags/scores are comparable.  Each block cites its source lines.
"""

from __future__ import annotations

# player_summary risky-flag thresholds (report_config.py:72-77).
PLAYER_SUMMARY_RTP = {
    "profit_threshold": 10_000.0,
    "profit_unconditional": 50_000.0,
    "rtp_threshold": 1.0,
    "bet_count_threshold": 10,
}

# risk_ctrl defaults and weights (report_config.py:17-66).
RISK_CTRL_1D = {
    "default_value_player": {
        "def_b_wma": 5_000_000.0,
        "def_b_wmasd": 5_000_000.0,
        "def_p_wma": 1_000_000.0,
        "def_p_wmasd": 1_000_000.0,
        "def_trans_wma": 5_000_000.0,
        "def_trans_wmasd": 5_000_000.0,
    },
    "default_value_game": {
        "def_b_wma": 50_000_000.0,
        "def_b_wmasd": 50_000_000.0,
        "def_p_wma": 10_000_000.0,
        "def_p_wmasd": 10_000_000.0,
        "def_trans_wma": 50_000_000.0,
        "def_trans_wmasd": 50_000_000.0,
    },
    "country_rate": {"THB": 0.05, "VND2": 1.0, "INR": 1.0, "PHP": 1.0},
    "risk_score_multi": {"b": 10.0, "wl": 50.0, "trans": 25.0, "p_trans_multi": 100.0},
    "rtp": {
        "profit_threshold": 10_000.0,
        "profit_unconditional": 50_000.0,
        "rtp_threshold": 1.0,
        "bet_count_threshold": 10,
        "time_to_alert_minutes": 1,
        "alert_limit": 5,
    },
}

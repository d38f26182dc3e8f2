"""Config layer tests: nested schema round-trip + flat hq semantics."""

from pathlib import Path

from ddnm_tpu.config import Config, HQConfig, load_config, load_hq_config

REPO = Path(__file__).resolve().parents[1]


def test_all_shipped_configs_load():
    for f in (REPO / "configs").glob("*.yml"):
        cfg = load_config(f)
        assert cfg.diffusion.num_diffusion_timesteps > 0
        assert cfg.model.type in ("simple", "openai")


def test_config_round_trip():
    cfg = load_config(REPO / "configs" / "celeba_hq.yml")
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2.model.ch == cfg.model.ch == 128
    assert tuple(cfg2.model.ch_mult) == (1, 1, 2, 2, 4, 4)
    assert cfg2.time_travel.T_sampling == 100


def test_hq_config_none_semantics(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("name: x\nschedule_jump_params:\n  t_T: 5\n")
    conf = load_hq_config(p)
    assert conf.name == "x"
    assert conf.missing_key is None  # NoneDict behaviour (conf_base.py:44-53)
    assert conf.pget("schedule_jump_params.t_T") == 5
    assert conf.pget("schedule_jump_params.nope", 7) == 7
    assert isinstance(conf, HQConfig)

"""ladder_report parsing: supervisor-relaunch segments must fold into
their ladder stage (header identity), placeholder losses must be dropped,
and the final-JSON / AP@0.5 extraction must survive a crash-looped log.

Pure-python (no jax): safe to run alongside a live TPU client.
"""

import json

from tools.ladder_report import _ap05_block, _merge_resumes, parse


def _log(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


HDR1 = 'INFO  finetune=False epochs=1200\n'
HDR2 = 'INFO  finetune=False epochs=600\n'
HDR3 = 'INFO  finetune=True epochs=100\n'


def _ep(n, loss, secs=2.0):
    return f'INFO  epoch {n}: train_loss={loss:.4f} ({secs}s, {n} its)\n'


def test_resume_segments_merge_on_header(tmp_path):
    # stage 1 runs, wedges, resumes from epoch 300 (optimizer restored),
    # then a weights-only restart begins again at epoch 1 — all three
    # segments share the header and must fold into ONE stage
    log = _log(tmp_path, 'l.log',
               HDR1 + _ep(1, 20.0) + _ep(2, 15.0)
               + HDR1 + _ep(300, 9.0) + _ep(301, 8.5)
               + HDR1 + _ep(1, 19.0)
               + HDR2 + _ep(1, 12.0) + _ep(600, 7.0))
    stages, _, _ = parse([log])
    assert len(stages) == 2
    by_epoch = {e: v for e, v, _ in stages[0]['hist']}
    # later segment wins on the duplicated epoch 1
    assert by_epoch[1] == 19.0
    assert by_epoch[300] == 9.0
    assert stages[1]['epochs'] == 600


def test_placeholder_zero_loss_dropped(tmp_path):
    # every process launch logs train_loss=0.0000 for epochs shorter than
    # log_every (trainer carries last_logged, initialized 0.0)
    log = _log(tmp_path, 'l.log',
               HDR3 + _ep(1, 0.0) + _ep(2, 0.12) + _ep(3, 0.25))
    stages, _, _ = parse([log])
    assert [e for e, _, _ in stages[0]['hist']] == [2, 3]


def test_crash_segments_and_final_json(tmp_path):
    # crash-looped stage-3 launches log the header but no epochs; the
    # last launch succeeds; final JSON and the AP@0.5 block are extracted
    final = {'ap_3d_moderate': 1.27, 'ap_bev_moderate': 1.88,
             'mota': 0.226, 'stages': [1200, 600, 100]}
    log = _log(tmp_path, 'l.log',
               HDR3 + HDR3 + HDR3 + _ep(1, 0.5) + _ep(100, 0.27)
               + 'Car AP@0.70, 0.70, 0.70:\n'
               + 'bev  AP:1.4281, 1.8801, 1.8801\n'
               + '3d   AP:1.0637, 1.2658, 1.2658\n'
               + 'Car AP@0.70, 0.50, 0.50:\n'
               + 'bev  AP:13.8985, 13.8704, 13.8704\n'
               + '3d   AP:11.5710, 11.7773, 11.7773\n'
               + json.dumps(final) + '\n')
    stages, eval_lines, parsed = parse([log])
    assert len(stages) == 1 and stages[0]['hist'][-1][0] == 100
    assert parsed == final
    ap05 = dict(_ap05_block(eval_lines))
    assert ap05['AP_bev'].startswith('13.8985')
    assert ap05['AP_3d'].startswith('11.5710')


def test_merge_preserves_distinct_stages():
    stages = [
        {'finetune': False, 'epochs': 100, 'hist': [(1, 5.0, 1.0)]},
        {'finetune': True, 'epochs': 100, 'hist': [(1, 2.0, 1.0)]},
    ]
    assert len(_merge_resumes(stages)) == 2

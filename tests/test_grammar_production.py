"""CI gate for the production-training orchestration
(tools/grammar_production.py): the --smoke mode drives the REAL train CLI
three times at CPU scale — including the SIGTERM preemption + checkpoint +
--resume sequence — then runs the held-out closed-loop / prompt-conditioning /
best-of-N evaluations from the checkpoints.  This is the no-TPU counterpart
of the r4 production run recorded in GRAMMAR_TPU.json (~4 min; by far the
cheapest way to catch a break anywhere in CLI → data → trainer → checkpoint →
eval composition).
"""

import json


class TestProductionOrchestration:
    def test_smoke_end_to_end(self, tmp_path):
        from valle2_tpu.tools.grammar_production import main
        out = tmp_path / 'GRAMMAR_SMOKE.json'
        main(['--smoke', '--run-dir', str(tmp_path / 'run'),
              '--out', str(out)])
        rep = json.loads(out.read_text())
        # The preemption really fired and the resume really completed.
        ar = rep['runs']['ValleAR']
        assert ar['phase_a']['preempted_at'] is not None
        assert ar['phase_b']['rc'] == 0
        assert ar['train'], 'no training curve parsed from the CLI logs'
        # All three models checkpointed; evals ran end-to-end (30-step models
        # score ~0 — the gate is the PIPELINE, the quality gate is the
        # full-scale run).
        for model in ('ValleAR', 'ValleNAR', 'ValleASR'):
            assert rep['runs'][model]['final_ckpt']
        ev = rep['evals']
        assert set(ev['closed_loop']) >= {0, 1} or set(ev['closed_loop']) >= {'0', '1'}
        pc = ev['prompt_conditioning']
        assert pc['n'] > 0 and 'match_exact' in pc
        assert 'beams_1_exact' in ev['best_of_n']

    def test_smoke_v3_end_to_end(self, tmp_path):
        """The --v3 orchestration (ambiguous grammar, dynamic realizations,
        corruption-trained NAR, off-ceiling eval suite) end-to-end at CPU
        scale — gates the PIPELINE; quality gates live in the full-scale
        run (GRAMMAR_V3_TPU.json) and tests/test_grammar_v3.py."""
        from valle2_tpu.tools.grammar_production import main
        out = tmp_path / 'GRAMMAR_V3_SMOKE.json'
        main(['--smoke', '--v3', '--run-dir', str(tmp_path / 'run'),
              '--out', str(out)])
        rep = json.loads(out.read_text())
        assert rep['runs']['ValleAR']['phase_a']['preempted_at'] is not None
        assert rep['runs']['ValleNAR_config']['nar_corrupt_p'] > 0
        ev = rep['evals']
        for key in ('closed_loop_v3', 'temperature_curve',
                    'best_of_n_validity', 'nll', 'nar_refinement',
                    'prompt_conditioning_v3'):
            assert key in ev, key
        assert ev['nll']['floor_per_phoneme'] > 0
        assert len(ev['temperature_curve']) == 4

"""landing_controller_tpu — a TPU-native trajectory-optimization framework for
quadruped landing control.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`se-hwan/landing-controller` reference (MATLAB/CasADi/IPOPT/KNITRO):

- ``dynamics``   : rotation/Euler-rate kit, spatial algebra (Featherstone),
                   single-rigid-body (SRBM) dynamics, closed-form leg
                   kinematics (FK / analytic Jacobian / IK).
- ``models``     : robot parameter registry (Mini Cheetah ``mc3D`` et al.) and
                   static rigid-body model arrays.
- ``problems``   : declarative NLP transcriptions (contact-scheduled,
                   contact-implicit LCP, kinodynamic torque-limited) as
                   batched residual stacks over a flat decision vector.
- ``solver``     : batched primal-dual interior-point engine (the IPOPT/KNITRO
                   replacement), vmap/pjit-compatible, fixed shapes.
- ``ops``        : Pallas TPU kernels for the hot solver loops.
- ``parallel``   : device mesh / shard_map scenario sharding, collectives.
- ``warmstart``  : reference-trajectory generator, solve cascade, MLP
                   warm-start pipeline.

Everything is functionally pure and jit/vmap friendly; physical and problem
quantities are runtime parameters (pytrees) so one compiled solve serves any
initial condition — the same parameterize-don't-recompile discipline as the
reference's ``opti.parameter`` design (quadruped_SRBM_NLP.m:52-77).
"""

__version__ = "0.1.0"

"""Model zoo: PointDSC+GMF, DGR inlier net+GMF, descriptor backbones.

Reference parity targets (SURVEY.md §2.2/§2.3):
- P1/P2 PointDSC + NonLocalNet -> pointdsc.py
- D1/D2 DGR engine + 6D inlier ResUNet -> dgr.py / dgr_engine.py
- P16/D3 FCGF sparse ResUNet -> fcgf.py
- P21 OANet encoder -> oanet.py
"""

from gmf_tpu.models.pointdsc import PointDSC, NonLocalNet, NonLocalBlock

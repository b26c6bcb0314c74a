// SPDX-License-Identifier: MIT
pragma solidity >=0.8.21;

import {Fr, FrLib} from "./Fr.sol";
import {Transcript, FiatShamirTranscript} from "./FiatShamirTranscript.sol";
import {SumcheckVerifier} from "./SumcheckVerifier.sol";

/// Batched-GKR grand product verification, mirroring
/// jolt_tpu/subprotocols/grand_product.py verify_grand_product
/// (reference grand_product.rs:122-251): per layer — RLC the batch claims,
/// verify a cubic sumcheck, check coeff·eq·left·right against the final
/// sumcheck claim, then fold (left, right) with a fresh challenge.
library GrandProductVerifier {
    using FiatShamirTranscript for Transcript;

    struct LayerProof {
        SumcheckVerifier.SumcheckProof sumcheck;
        Fr[] leftClaims;
        Fr[] rightClaims;
    }

    struct GrandProductProof {
        LayerProof[] layers;
    }

    function verify(
        GrandProductProof memory proof,
        Fr[] memory claims,
        Transcript memory t
    ) internal pure returns (Fr[] memory, Fr[] memory) {
        Fr[] memory rGP = new Fr[](0);
        Fr one = FrLib.from(1);

        for (uint256 layer = 0; layer < proof.layers.length; layer++) {
            LayerProof memory lp = proof.layers[layer];
            Fr[] memory coeffs = t.challengeVector(claims.length);
            Fr joint = FrLib.from(0);
            for (uint256 i = 0; i < claims.length; i++) {
                joint = joint + claims[i] * coeffs[i];
            }

            (Fr sumcheckClaim, Fr[] memory rSC) = SumcheckVerifier.verify(
                lp.sumcheck, joint, layer, 3, t);
            require(lp.leftClaims.length == claims.length, "claim count");

            for (uint256 i = 0; i < claims.length; i++) {
                t.appendScalar(Fr.unwrap(lp.leftClaims[i]));
                t.appendScalar(Fr.unwrap(lp.rightClaims[i]));
            }

            // eq(rGP, reverse(rSC))
            Fr eqEval = one;
            for (uint256 i = 0; i < rGP.length; i++) {
                Fr a = rGP[i];
                Fr b = rSC[rSC.length - 1 - i];
                eqEval = eqEval * (a * b + (one - a) * (one - b));
            }

            Fr expected = FrLib.from(0);
            for (uint256 i = 0; i < claims.length; i++) {
                expected = expected
                    + coeffs[i] * lp.leftClaims[i] * lp.rightClaims[i] * eqEval;
            }
            require(expected == sumcheckClaim, "layer claim mismatch");

            // fold claims with a fresh challenge; extend the GP point
            Fr rLayer = t.challengeScalar();
            Fr[] memory newClaims = new Fr[](claims.length);
            for (uint256 i = 0; i < claims.length; i++) {
                newClaims[i] = lp.leftClaims[i]
                    + rLayer * (lp.rightClaims[i] - lp.leftClaims[i]);
            }
            claims = newClaims;

            Fr[] memory newR = new Fr[](rSC.length + 1);
            for (uint256 i = 0; i < rSC.length; i++) {
                newR[i] = rSC[rSC.length - 1 - i];   // reversed
            }
            newR[rSC.length] = rLayer;
            rGP = newR;
        }
        return (claims, rGP);
    }
}

// Minimal ensmallen-compatible L-BFGS — enough to compile and run the
// reference Sync's per-frame motion refinement (core_private.cpp:262-296)
// without the real ensmallen library.
//
// Standard two-loop-recursion L-BFGS (memory 10) with Armijo
// backtracking line search (c1 = 1e-4, halving, <= 50 trials),
// stopping on MinGradientNorm / MaxIterations / no line-search
// progress. NOTE (documented deviation): real ensmallen uses a
// cubic-interpolating Wolfe line search, so iterate trajectories
// differ; both converge to the same per-frame minimum (smooth 3-dof
// objective, gradient-norm stop), which is what the golden Sync
// comparison relies on.
#pragma once

#include <armadillo>
#include <cstddef>

namespace ens {

class L_BFGS {
   public:
    std::size_t& MaxIterations() { return max_iterations_; }
    double& MinGradientNorm() { return min_gradient_norm_; }

    template <class F>
    double Optimize(F& f, arma::mat& x) {
        const std::size_t mem = 10;
        const std::size_t d = x.size();
        std::vector<arma::mat> S, Y;
        std::vector<double> rho;

        arma::mat g(d, 1);
        double fx = f.EvaluateWithGradient(x, g);

        for (std::size_t it = 0; it < max_iterations_; ++it) {
            if (arma::norm(g) < min_gradient_norm_) break;

            // two-loop recursion (newest entries at the back)
            arma::mat q = g;
            std::vector<double> alpha(S.size());
            for (std::size_t i = S.size(); i-- > 0;) {
                alpha[i] = rho[i] * arma::dot(S[i], q);
                q -= alpha[i] * Y[i];
            }
            if (!S.empty()) {
                std::size_t l = S.size() - 1;
                double gamma =
                    arma::dot(S[l], Y[l]) / std::max(arma::dot(Y[l], Y[l]), 1e-30);
                q *= gamma;
            }
            for (std::size_t i = 0; i < S.size(); ++i) {
                double beta = rho[i] * arma::dot(Y[i], q);
                q += (alpha[i] - beta) * S[i];
            }
            arma::mat dir = -q;
            double gd = arma::dot(g, dir);
            if (gd >= 0) {  // not a descent direction: steepest-descent restart
                dir = -g;
                gd = -arma::dot(g, g);
            }

            // Armijo backtracking
            double t = 1.0;
            double f_new = fx;
            arma::mat x_new = x;
            bool accepted = false;
            for (int ls = 0; ls < 50; ++ls) {
                x_new = x + t * dir;
                f_new = evaluate_only(f, x_new);
                if (f_new <= fx + 1e-4 * t * gd) {
                    accepted = true;
                    break;
                }
                t *= 0.5;
            }
            if (!accepted) break;

            arma::mat g_new(d, 1);
            f_new = f.EvaluateWithGradient(x_new, g_new);
            arma::mat s = x_new - x;
            arma::mat y = g_new - g;
            double sy = arma::dot(s, y);
            if (sy > 1e-10) {
                S.push_back(s);
                Y.push_back(y);
                rho.push_back(1.0 / sy);
                if (S.size() > mem) {
                    S.erase(S.begin());
                    Y.erase(Y.begin());
                    rho.erase(rho.begin());
                }
            }
            x = x_new;
            g = g_new;
            fx = f_new;
        }
        return fx;
    }

   private:
    template <class F>
    static double evaluate_only(F& f, const arma::mat& x) {
        arma::mat g(x.size(), 1);
        return f.EvaluateWithGradient(const_cast<arma::mat&>(x), g);
    }

    std::size_t max_iterations_ = 10;
    double min_gradient_norm_ = 1e-6;
};

}  // namespace ens

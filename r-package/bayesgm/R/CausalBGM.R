# R6 wrapper for the Python CausalBGM engine (reference R/CausalBGM.R).

.causalbgm_defaults <- list(
  z_dims = c(3L, 3L, 6L, 6L),
  binary_treatment = TRUE,
  use_bnn = TRUE,
  dataset = "Rdata",
  output_dir = ".",
  save_res = FALSE,
  save_model = FALSE,
  g_units = c(64L, 64L, 64L, 64L, 64L),
  e_units = c(64L, 64L, 64L, 64L, 64L),
  f_units = c(64L, 32L, 8L),
  h_units = c(64L, 32L, 8L),
  dz_units = c(64L, 32L, 8L),
  lr = 2e-4, lr_theta = 1e-4, lr_z = 1e-4,
  g_d_freq = 5L, kl_weight = 1e-4, use_z_rec = 1.0
)

#' CausalBGM model (R6)
#'
#' @description Causal inference with a 4-way-partitioned latent generative
#'   model; wraps `bayesgm_tpu.CausalBGM`.
#' @export
CausalBGM <- R6::R6Class("CausalBGM",
  public = list(
    #' @field params Merged parameter list.
    params = NULL,

    #' @description Create a CausalBGM model.
    #' @param params Named list of overrides for the defaults.
    #' @param random_seed Integer seed (or NULL).
    initialize = function(params = list(), random_seed = NULL) {
      self$params <- utils::modifyList(.causalbgm_defaults, params)
      private$seed <- random_seed
    },

    #' @description Fit on a (x, y, v) triplet.
    #' @param x,y,v Treatment, outcome, covariates.
    #' @param epochs,epochs_per_eval,batch_size,startoff Training controls.
    #' @param use_egm_init,egm_n_iter,egm_batches_per_eval EGM warm-start
    #'   controls.
    #' @param save_format Output file format when `save_res`/`save_model`.
    #' @param verbose 0 silences per-epoch logs.
    fit = function(x, y, v, epochs = 100L, epochs_per_eval = 5L,
                   batch_size = 32L, startoff = 0L,
                   use_egm_init = TRUE, egm_n_iter = 30000L,
                   egm_batches_per_eval = 500L, save_format = "txt",
                   verbose = 1L) {
      d <- .validate_triplet(x, y, v)
      p <- self$params
      p$v_dim <- ncol(d$v)
      model <- .bayesgm_module()$CausalBGM(
        params = reticulate::dict(p),
        random_seed = if (is.null(private$seed)) NULL else as.integer(private$seed))
      model$fit(
        data = reticulate::tuple(.np_f32(d$x), .np_f32(d$y), .np_f32(d$v)),
        epochs = as.integer(epochs),
        epochs_per_eval = as.integer(epochs_per_eval),
        batch_size = as.integer(batch_size), startoff = as.integer(startoff),
        use_egm_init = use_egm_init, egm_n_iter = as.integer(egm_n_iter),
        egm_batches_per_eval = as.integer(egm_batches_per_eval),
        save_format = save_format, verbose = as.integer(verbose))
      private$model <- model
      invisible(self)
    },

    #' @description Posterior causal-effect estimates.
    #' @param x,y,v Test triplet.
    #' @param alpha Significance level.
    #' @param n_mcmc,burn_in,q_sd MCMC controls.
    #' @param x_values Treatment grid (continuous treatment only).
    #' @param sample_y Draw y from the posterior predictive (vs its mean).
    #' @param bs Subject-batch size; NULL (default) lets the engine
    #'   auto-size (one full-data launch for BNN + continuous treatment).
    #' @return list(effect = ..., interval = ...)
    predict = function(x, y, v, alpha = 0.01, n_mcmc = 3000L,
                       burn_in = 5000L, q_sd = 1.0, x_values = NULL,
                       sample_y = TRUE, bs = NULL) {
      stopifnot(!is.null(private$model))
      d <- .validate_triplet(x, y, v)
      args <- list(
        data = reticulate::tuple(.np_f32(d$x), .np_f32(d$y), .np_f32(d$v)),
        alpha = alpha, n_mcmc = as.integer(n_mcmc),
        burn_in = as.integer(burn_in), q_sd = q_sd, sample_y = sample_y)
      if (!is.null(x_values)) args$x_values <- as.numeric(x_values)
      if (!is.null(bs)) args$bs <- as.integer(bs)
      res <- do.call(private$model$predict, args)
      list(effect = as.numeric(res[[1]]), interval = as.matrix(res[[2]]))
    }
  ),
  private = list(model = NULL, seed = NULL)
)
